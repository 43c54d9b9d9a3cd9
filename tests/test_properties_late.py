"""Property-based tests (hypothesis) for the late round-3 operators:
chunking reconstruction, entropy bounds, moments vs numpy, string_agg
reconstruction. Hypothesis drives the INPUTS; the Ray session is the
shared fixture, and example counts stay small because each example
round-trips through Ray."""

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_orc_ray.pipelines import relational as rel
from datafusion_orc_ray.pipelines import text as tx
from datafusion_orc_ray.pipelines.relational import collect

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

texts_st = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.sampled_from("ab c\t\nxyz0"), min_size=0, max_size=60
        ),
    ),
    min_size=1,
    max_size=20,
)


@given(texts=texts_st, max_tokens=st.integers(2, 6), overlap=st.integers(0, 1))
@settings(**_SETTINGS)
def test_chunking_reconstructs_token_stream(ray_session, texts, max_tokens, overlap):
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = collect(
        tx.chunk_documents(
            ray.data.from_arrow(tbl).repartition(2), max_tokens, overlap=overlap
        )
    ).sort_by([("doc_id", "ascending"), ("chunk_id", "ascending")])
    step = max_tokens - overlap
    rows = out.to_pylist()
    for i, t in enumerate(texts):
        toks = (t or "").split()
        mine = [r for r in rows if r["doc_id"] == i]
        # stripping the overlap from every non-first chunk reconstructs
        # the exact token stream
        rebuilt = []
        for j, r in enumerate(mine):
            assert r["chunk_id"] == j and r["chunk_id"] * step < len(toks)
            ctoks = r["chunk_text"].split()
            assert len(ctoks) == r["n_tok"] <= max_tokens
            rebuilt.extend(ctoks if j == 0 else ctoks[overlap:])
        assert rebuilt == toks


@given(texts=texts_st)
@settings(**_SETTINGS)
def test_entropy_bounds(ray_session, texts):
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = collect(tx.byte_entropy(ray.data.from_arrow(tbl))).sort_by("doc_id")
    for t, e in zip(texts, out.column("entropy").to_pylist()):
        if not t:
            assert e is None
        else:
            # output is rounded to 4dp, so allow 5e-5 over the bound
            assert 0.0 <= e <= np.log(min(len(t.encode()), 256)) + 5.1e-5


@given(
    vals=st.lists(
        st.floats(-1e4, 1e4, allow_nan=False, allow_infinity=False, width=64),
        min_size=2,
        max_size=200,
    )
)
@settings(**_SETTINGS)
def test_moments_match_numpy(ray_session, vals):
    tbl = pa.table({"g": pa.array([1] * len(vals)), "x": pa.array(vals, pa.float64())})
    out = rel.grouped_moments(
        ray.data.from_arrow(tbl).repartition(3), ["g"], "x"
    ).to_pylist()[0]
    assert out["n"] == len(vals)
    # output is rounded to 4dp, so |out - exact| <= 5e-5 + fp noise
    assert abs(out["mean_x"] - np.mean(vals)) < 1e-4
    if np.std(vals) > 1e-6:
        assert abs(out["std_x"] - np.std(vals, ddof=1)) < max(
            2e-3, 1e-4 * np.std(vals, ddof=1)
        )
