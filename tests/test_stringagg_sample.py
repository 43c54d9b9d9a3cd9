"""grouped_string_agg (ordered listagg, SQL null semantics) and
deterministic n-per-group sampling."""

import numpy as np
import pyarrow as pa
import ray.data

from datafusion_orc_ray.pipelines import corpus as co
from datafusion_orc_ray.pipelines import windows as w
from datafusion_orc_ray.pipelines.relational import collect


def test_string_agg_order_nulls_and_allnull_group(ray_session):
    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "o": pa.array([3, 1, 2, 1, 2, 1], pa.int64()),
            "v": ["c", "a", None, None, None, "z"],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = collect(w.grouped_string_agg(ds, "k", "o", "v", sep="|", out_col="s")).sort_by("k")
    # order by o; null value skipped; all-null group -> NULL aggregate
    assert out.column("k").to_pylist() == [1, 2, 3]
    assert out.column("s").to_pylist() == ["a|c", None, "z"]


def test_string_agg_casts_nonstring_values(ray_session):
    tbl = pa.table(
        {"k": ["a", "a"], "o": [2, 1], "v": pa.array([10, 7], pa.int64())}
    )
    out = collect(w.grouped_string_agg(ray.data.from_arrow(tbl), "k", "o", "v"))
    assert out.column("vals").to_pylist() == ["7,10"]


def test_string_agg_partitioning_invariant(ray_session):
    rng = np.random.default_rng(6)
    n = 3000
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, n)),
            "o": pa.array(rng.permutation(n)),
            "v": pa.array([f"e{i%7}" for i in range(n)]),
        }
    )
    a = collect(w.grouped_string_agg(ray.data.from_arrow(tbl).repartition(1), "k", "o", "v")).sort_by("k")
    b = collect(w.grouped_string_agg(ray.data.from_arrow(tbl).repartition(11), "k", "o", "v")).sort_by("k")
    assert a.equals(b)


def test_sample_n_per_group_deterministic_and_bounded(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1000), pa.int64()),
            "lang": pa.array([f"l{i % 4}" for i in range(1000)]),
        }
    )
    a = co.sample_n_per_group(ray.data.from_arrow(tbl).repartition(2), 7, "lang")
    b = co.sample_n_per_group(ray.data.from_arrow(tbl).repartition(9), 7, "lang")
    at = a.sort_by([("lang", "ascending"), ("doc_id", "ascending")])
    bt = b.sort_by([("lang", "ascending"), ("doc_id", "ascending")])
    assert at.equals(bt)
    import collections

    cnt = collections.Counter(at.column("lang").to_pylist())
    assert all(v == 7 for v in cnt.values()) and len(cnt) == 4


def test_sample_n_per_group_small_groups_keep_all(ray_session):
    tbl = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()), "lang": ["a", "a", "b"]}
    )
    out = co.sample_n_per_group(ray.data.from_arrow(tbl), 5, "lang")
    assert out.num_rows == 3


def test_byte_entropy_known_values(ray_session):
    import math

    from datafusion_orc_ray.pipelines import text as tx

    docs = ["aaaa", "ab", "", None, "abcd"]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": docs})
    out = collect(tx.byte_entropy(ray.data.from_arrow(tbl).repartition(2))).sort_by("doc_id")
    got = out.column("entropy").to_pylist()
    assert got[0] == 0.0                      # single symbol
    assert got[1] == round(math.log(2), 4)    # two equiprobable
    assert got[2] is None and got[3] is None  # empty / null -> NULL
    assert got[4] == round(math.log(4), 4)


def _reassemble(t: pa.Table, key_col: str, sep: str = ",") -> dict:
    """Chunked (key, chunk_idx, vals) -> {key: full_agg} per the
    documented contract: sep-join of non-null chunks by chunk_idx,
    NULL iff every chunk is NULL."""
    rows = sorted(t.to_pylist(), key=lambda r: (str(r[key_col]), r["chunk_idx"]))
    out: dict = {}
    for r in rows:
        k = r[key_col]
        if k not in out:
            out[k] = None
        if r["vals"] is not None:
            out[k] = r["vals"] if out[k] is None else out[k] + sep + r["vals"]
    return out


def test_string_agg_chunked_matches_whole_key(ray_session):
    """VERDICT r4 #2: chunk_values caps every output row at N values and
    reassembly equals the whole-key aggregate, including all-NULL keys."""
    rng = np.random.default_rng(11)
    n = 5000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, n)),
            "o": pa.array(rng.permutation(n)),
            "v": pa.array(
                [None if i % 17 == 0 else f"v{i}" for i in range(n)], pa.string()
            ),
            "id": pa.array(np.arange(n)),
        }
    )
    # one key with only NULL values
    t = pa.concat_tables(
        [t, pa.table({"k": pa.array([999, 999]), "o": pa.array([0, 1]),
                      "v": pa.array([None, None], pa.string()),
                      "id": pa.array([n, n + 1])})]
    )
    ds = ray.data.from_arrow(t).repartition(4)
    whole = collect(w.grouped_string_agg(ds, "k", "o", "v", tiebreak="id"))
    want = {r["k"]: r["vals"] for r in whole.to_pylist()}
    chunked = collect(
        w.grouped_string_agg(ds, "k", "o", "v", tiebreak="id", chunk_values=25)
    )
    for r in chunked.to_pylist():
        if r["vals"] is not None:
            assert r["vals"].count(",") <= 24  # <= 25 values per chunk row
    assert _reassemble(chunked, "k") == want
    # a key with > chunk_values values really is split into many rows
    biggest = max(want, key=lambda k: (want[k] or "").count(","))
    n_chunks = sum(1 for r in chunked.to_pylist() if r["k"] == biggest)
    assert n_chunks > 1


def test_string_agg_chunked_hot_key_split(ray_session):
    """A mega-key under hot_keys='auto' splits across order-range bins;
    chunk_idx stays globally ordered (bin index in the high bits) and
    reassembly equals the cold whole-key aggregate exactly."""
    rng = np.random.default_rng(23)
    n = 8000
    t = pa.table(
        {
            "k": pa.array(np.where(rng.random(n) < 0.9, 7, rng.integers(0, 5, n))),
            "o": pa.array(rng.permutation(n)),
            "v": pa.array([f"x{i}" for i in range(n)], pa.string()),
            "id": pa.array(np.arange(n)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    whole = collect(w.grouped_string_agg(ds, "k", "o", "v", tiebreak="id"))
    want = {r["k"]: r["vals"] for r in whole.to_pylist()}
    chunked = collect(
        w.grouped_string_agg(
            ds, "k", "o", "v", tiebreak="id",
            chunk_values=100, hot_keys="auto", hot_bytes=20_000,
        )
    )
    plan = w._plan_hot_split(ds, "k", "o", "o", 4, 20_000, with_bases=False)
    assert plan is not None and 7 in plan.keys
    assert plan.n_parts(plan.keys.index(7)) >= 2  # really split
    for r in chunked.to_pylist():
        if r["vals"] is not None:
            assert r["vals"].count(",") <= 99
    assert _reassemble(chunked, "k") == want


def test_string_agg_hot_keys_requires_chunking(ray_session):
    import pytest

    t = pa.table({"k": [1], "o": [1], "v": ["a"]})
    with pytest.raises(ValueError, match="chunk_values"):
        w.grouped_string_agg(
            ray.data.from_arrow(t), "k", "o", "v", hot_keys="auto"
        )
