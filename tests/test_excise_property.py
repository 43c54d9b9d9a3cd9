"""Property test: excise_shared_spans vs a brute-force per-pair
reference on small random corpora (hypothesis drives token streams with
heavy overlap so shared windows actually occur)."""

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_orc_ray.pipelines.dedup import excise_shared_spans
from datafusion_orc_ray.pipelines.relational import collect

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# tiny alphabet + short windows => shared k-windows are common
corpus_st = st.lists(
    st.one_of(
        st.none(),
        st.lists(st.sampled_from("abc"), min_size=0, max_size=12).map(" ".join),
    ),
    min_size=2,
    max_size=8,
)


def _reference(texts, k):
    """O(n^2) oracle: all k-windows -> owner = min doc; non-owner
    coverage union; rebuild."""
    toks = [None if t is None else t.split() for t in texts]
    wins = {}
    for d, ts in enumerate(toks):
        if ts is None:
            continue
        for i in range(len(ts) - k + 1):
            wins.setdefault(tuple(ts[i : i + k]), set()).add(d)
    out = []
    for d, ts in enumerate(toks):
        if ts is None:
            out.append((None, 0))
            continue
        cov = np.zeros(len(ts), bool)
        for i in range(len(ts) - k + 1):
            docs = wins[tuple(ts[i : i + k])]
            if len(docs) >= 2 and min(docs) != d:
                cov[i : i + k] = True
        kept = [t for t, c in zip(ts, cov) if not c]
        out.append((" ".join(kept), int(cov.sum())))
    return out


@given(texts=corpus_st, k=st.integers(2, 4))
@settings(**_SETTINGS)
def test_excise_matches_bruteforce(ray_session, texts, k):
    docs = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    want = _reference(texts, k)
    got = collect(
        excise_shared_spans(ray.data.from_arrow(docs).repartition(2), k=k)
    ).sort_by("doc_id")
    rows = got.to_pylist()
    assert [(r["text_excised"], r["n_removed"]) for r in rows] == want
