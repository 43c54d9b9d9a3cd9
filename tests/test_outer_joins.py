"""left/full outer joins through hash_join's broadcast AND bucket
paths, with null keys and skew."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from datafusion_orc_ray.pipelines import relational as rel


def _l():
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 3, None], pa.int64()),
                "lv": pa.array([10, 11, 12, 13, 14], pa.int64()),
            }
        )
    ).repartition(2)


def _r():
    return ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array([1, 2, 4, None], pa.int64()),
                "rv": pa.array([100, 200, 400, 999], pa.int64()),
            }
        )
    ).repartition(2)


EXPECT_LEFT = [
    (10, 100), (11, 100), (12, 200), (13, None), (14, None),
]


def _left_outer_rows(kw):
    out = rel.collect(
        rel.hash_join(_l(), _r(), "k", "rk", join_type="left outer", **kw)
    ).sort_by([("lv", "ascending")])
    return list(zip(out.column("lv").to_pylist(), out.column("rv").to_pylist()))


def test_left_outer_broadcast_path(ray_session):
    assert _left_outer_rows({}) == EXPECT_LEFT


def test_left_outer_bucket_path(ray_session):
    # broadcast_rows=0 forces the bucket exchange
    assert _left_outer_rows({"broadcast_rows": 0}) == EXPECT_LEFT


def test_left_outer_hot_key_path(ray_session):
    # key 1 is 40% of the left sample -> hot split engages
    assert _left_outer_rows({"broadcast_rows": 0, "hot_key_share": 0.3}) == EXPECT_LEFT


def test_full_outer_emits_both_unmatched(ray_session):
    out = rel.collect(
        rel.hash_join(_l(), _r(), "k", "rk", join_type="full outer")
    )
    rows = sorted(
        zip(out.column("lv").to_pylist(), out.column("rv").to_pylist()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1] is None, t[1] or 0),
    )
    # left-unmatched: 13 (k=3), 14 (null key); right-unmatched: 400 (k=4), 999 (null)
    assert rows == [
        (10, 100), (11, 100), (12, 200), (13, None), (14, None),
        (None, 400), (None, 999),
    ]


def test_full_outer_skewed_matches_duckdb(ray_session):
    rng = np.random.default_rng(8)
    lk = np.concatenate([np.full(500, 7), rng.integers(0, 50, 500)])
    l = ray.data.from_arrow(
        pa.table({"k": pa.array(lk, pa.int64()), "lv": pa.array(np.arange(1000))})
    ).repartition(4)
    r = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array(np.arange(30, 80), pa.int64()),
                "rv": pa.array(np.arange(30, 80) * 10),
            }
        )
    ).repartition(2)
    out = rel.collect(rel.hash_join(l, r, "k", "rk", join_type="full outer"))
    # validate counts directly: matched left rows + unmatched both sides
    lk_set = set(np.arange(30, 80).tolist())
    matched = int(np.isin(lk, list(lk_set)).sum())
    unmatched_left = 1000 - matched
    unmatched_right = len([x for x in range(30, 80) if x not in set(lk.tolist())])
    assert out.num_rows == matched + unmatched_left + unmatched_right


def test_bloom_prefilter_rejected_for_outer(ray_session):
    with pytest.raises(ValueError):
        rel.hash_join(_l(), _r(), "k", "rk", join_type="left outer", bloom_prefilter=True)
    with pytest.raises(ValueError):
        rel.hash_join_on(_l(), _r(), ["k", "k"], ["rk", "rk"], join_type="full outer")


def test_asof_partitioned_matches_semantics(ray_session):
    from datafusion_orc_ray.pipelines import windows as w

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 3, None], pa.int64()),
                "ts": pa.array([5, 15, 25, 7, 9, 9], pa.int64()),
                "lv": pa.array(range(6), pa.int64()),
            }
        )
    ).repartition(3)
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, None], pa.int64()),
                "rts": pa.array([10, 20, 7, 1], pa.int64()),
                "mark": ["a", "b", "c", "x"],
            }
        )
    ).repartition(2)
    out = rel.collect(
        w.asof_join_partitioned(left, right, "k", "ts", "rts", {"mark": "mark"})
    ).sort_by("lv")
    # k=1: ts5 -> none, ts15 -> a(10), ts25 -> b(20); k=2: ts7 -> c (<=);
    # k=3 no right; null key -> no match
    assert out.column("mark").to_pylist() == [None, "a", "b", "c", None, None]


def test_asof_partitioned_type_mismatch_raises(ray_session):
    from datafusion_orc_ray.pipelines import windows as w

    l = ray.data.from_arrow(
        pa.table({"k": [1], "ts": pa.array([1], pa.timestamp("us")), "lv": [1]})
    )
    r = ray.data.from_arrow(
        pa.table({"k": [1], "rts": pa.array([1], pa.timestamp("ms")), "m": ["a"]})
    )
    with pytest.raises(TypeError):
        w.asof_join_partitioned(l, r, "k", "ts", "rts", {"m": "m"})
