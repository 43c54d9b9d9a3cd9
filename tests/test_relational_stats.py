"""Moments (stddev/var/covar/corr), grouped argbest (max_by/min_by with
deterministic ties), and distinct set ops (INTERSECT/EXCEPT)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from datafusion_orc_ray.pipelines import relational as rel


def _sorted(t: pa.Table, keys) -> pa.Table:
    return t.sort_by([(k, "ascending") for k in keys])


def test_grouped_moments_matches_numpy_with_nulls(ray_session):
    rng = np.random.default_rng(3)
    n = 5000
    g = rng.integers(0, 4, n)
    x = rng.normal(100.0, 15.0, n)
    y = 3.0 * x + rng.normal(0, 5.0, n)
    xm = rng.random(n) < 0.05
    ym = rng.random(n) < 0.05
    tbl = pa.table(
        {
            "g": pa.array(g),
            "x": pa.array(np.where(xm, np.nan, x)).cast(pa.float64()),
            "y": pa.array(np.where(ym, np.nan, y)).cast(pa.float64()),
        }
    )
    # nan -> null so Arrow validity drives the SQL semantics
    import pyarrow.compute as pc

    tbl = pa.table(
        {
            "g": tbl.column("g"),
            "x": pc.if_else(pc.is_nan(tbl.column("x")), pa.scalar(None, pa.float64()), tbl.column("x")),
            "y": pc.if_else(pc.is_nan(tbl.column("y")), pa.scalar(None, pa.float64()), tbl.column("y")),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = _sorted(rel.grouped_moments(ds, ["g"], "x", "y"), ["g"]).to_pydict()
    for i, gv in enumerate(out["g"]):
        m = (g == gv) & ~xm & ~ym
        xs, ys = x[m], y[m]
        assert out["n"][i] == m.sum()
        assert out["covar_xy"][i] == pytest.approx(np.cov(xs, ys, ddof=1)[0, 1], abs=2e-4)
        assert out["corr_xy"][i] == pytest.approx(np.corrcoef(xs, ys)[0, 1], abs=2e-4)
    # single-column mode: std over x-valid rows only
    out1 = _sorted(rel.grouped_moments(ds, ["g"], "x"), ["g"]).to_pydict()
    for i, gv in enumerate(out1["g"]):
        xs = x[(g == gv) & ~xm]
        assert out1["std_x"][i] == pytest.approx(np.std(xs, ddof=1), abs=2e-4)


def test_grouped_moments_null_semantics(ray_session):
    tbl = pa.table(
        {
            "g": ["a", "a", "b", "c", "c"],
            "x": pa.array([1.0, 2.0, 5.0, 7.0, 7.0]),
            "y": pa.array([1.0, None, 2.0, 3.0, 3.0]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = _sorted(rel.grouped_moments(ds, ["g"], "x", "y"), ["g"]).to_pydict()
    # group a: only one both-valid row -> var/covar/corr NULL
    assert out["n"][0] == 1 and out["var_x"][0] is None and out["corr_xy"][0] is None
    # group b: n=1 -> same
    assert out["var_x"][1] is None
    # group c: constant x and y -> var 0, corr NULL (zero denominator)
    assert out["var_x"][2] == 0.0 and out["corr_xy"][2] is None


def test_grouped_argbest_ties_and_nulls(ray_session):
    tbl = pa.table(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "v": pa.array([5.0, 5.0, 1.0, None, 2.0, None]),
            "p": [9, 4, 1, 7, 8, 5],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = _sorted(rel.grouped_argbest(ds, ["k"], "v", "p"), ["k"]).to_pydict()
    # k=1: tie at v=5.0 -> min payload 4; k=2: null v ignored; k=3 all-null dropped
    assert out["k"] == [1, 2]
    assert out["p"] == [4, 8]
    omin = _sorted(rel.grouped_argbest(ds, ["k"], "v", "p", mode="min"), ["k"]).to_pydict()
    assert omin["p"] == [1, 8]


def test_grouped_argbest_partitioning_invariant(ray_session):
    rng = np.random.default_rng(11)
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 50, 4000)),
            "v": pa.array(rng.integers(0, 20, 4000).astype(np.float64)),
            "p": pa.array(rng.integers(0, 10**6, 4000)),
        }
    )
    a = _sorted(rel.grouped_argbest(ray.data.from_arrow(tbl).repartition(1), ["k"], "v", "p"), ["k"])
    b = _sorted(rel.grouped_argbest(ray.data.from_arrow(tbl).repartition(13), ["k"], "v", "p"), ["k"])
    assert a.equals(b)


def test_set_ops_null_and_dup_semantics(ray_session):
    left = ray.data.from_arrow(
        pa.table({"a": pa.array([1, 1, 2, None, None, 3], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"b": pa.array([2, 2, None, 4], pa.int64())})
    )
    inter = rel.collect(rel.intersect_distinct(left, right, ["a"], ["b"]))
    # INTERSECT dedups and matches NULL with NULL (IS NOT DISTINCT FROM)
    assert sorted(inter.column("a").to_pylist(), key=lambda v: (v is None, v)) == [2, None]
    exc = rel.collect(rel.except_distinct(left, right, ["a"], ["b"]))
    assert sorted(exc.column("a").to_pylist()) == [1, 3]


def test_distinct_rows_multicol(ray_session):
    tbl = pa.table({"a": [1, 1, 1, 2], "b": ["x", "x", "y", "x"]})
    out = rel.distinct_rows(ray.data.from_arrow(tbl).repartition(2), ["a", "b"])
    assert out.num_rows == 3


def test_hash_join_stats_gated_broadcast_vs_bucket(ray_session, caplog):
    """The broadcast-vs-bucket decision comes from source statistics
    (row count AND byte estimate), is logged, and both paths agree
    (VERDICT r3 next #5)."""
    import logging

    lt = pa.table({"k": pa.array([1, 2, 3, 4, 5] * 40, pa.int64()),
                   "lv": pa.array(range(200), pa.int64())})
    rt = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                   "rv": pa.array(["a", "b", "c"])})
    left, right = ray.data.from_arrow(lt), ray.data.from_arrow(rt)
    with caplog.at_level(logging.INFO, logger="datafusion_orc_ray.join"):
        got_b = rel.collect(rel.hash_join(left, right, "k", "k")).sort_by(
            [("lv", "ascending")]
        )
        assert "broadcast path" in caplog.text
        caplog.clear()
        # same small row count, but a byte gate of 1 forces the bucket path
        got_k = rel.collect(
            rel.hash_join(left, right, "k", "k", broadcast_bytes=1, n_buckets=4)
        ).sort_by([("lv", "ascending")])
        assert "bucket path" in caplog.text
    assert got_b.equals(got_k)
    assert got_b.num_rows == 120  # keys 1-3 match, 40 rows each
