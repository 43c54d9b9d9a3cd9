"""hash_join_on (composite keys) and grouped_mode."""

import pyarrow as pa
import pytest
import ray.data

from datafusion_orc_ray.pipelines import relational as rel


def test_hash_join_on_inner_null_components_never_match(ray_session):
    left = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 1, 2, None], pa.int64()),
                "b": ["x", "y", "x", "x"],
                "lv": pa.array([10, 11, 12, 13], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 2, None], pa.int64()),
                "b": ["x", "x", "x"],
                "rv": pa.array([100, 200, 300], pa.int64()),
            }
        )
    )
    out = rel.collect(
        rel.hash_join_on(left, right, ["a", "b"], ["a", "b"])
    ).sort_by("lv")
    # (1,x)->100, (2,x)->200; (1,y) no match; NULL component never joins
    assert out.column("lv").to_pylist() == [10, 12]
    assert out.column("rv").to_pylist() == [100, 200]
    assert set(out.column_names) == {"a", "b", "lv", "rv"}


def test_hash_join_on_anti_keeps_null_left(ray_session):
    left = ray.data.from_arrow(
        pa.table({"a": pa.array([1, None], pa.int64()), "b": ["x", "x"], "lv": [1, 2]})
    )
    right = ray.data.from_arrow(
        pa.table({"a": pa.array([1], pa.int64()), "b": ["x"]})
    )
    out = rel.collect(
        rel.hash_join_on(left, right, ["a", "b"], ["a", "b"], join_type="left anti")
    )
    # SQL NOT EXISTS: the NULL-key row survives
    assert out.column("lv").to_pylist() == [2]


def test_hash_join_on_validates(ray_session):
    ds = ray.data.from_arrow(pa.table({"a": [1]}))
    with pytest.raises(ValueError):
        rel.hash_join_on(ds, ds, ["a"], ["a", "b"])


def test_grouped_mode_ties_and_nulls(ray_session):
    tbl = pa.table(
        {
            "g": ["p", "p", "p", "p", "q", "q", "r"],
            "v": ["b", "a", "a", "b", None, "z", None],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = rel.grouped_mode(ds, ["g"], "v").sort_by([("g", "ascending")])
    # p: tie a/b at 2 -> smallest 'a'; q: nulls ignored -> z; r: all null -> dropped
    assert out.column("g").to_pylist() == ["p", "q"]
    assert out.column("v").to_pylist() == ["a", "z"]
    assert out.column("n").to_pylist() == [2, 1]


def test_grouped_nunique_ignores_nulls(ray_session):
    tbl = pa.table(
        {"k": [1, 1, 1, 2, 2], "v": ["a", "a", None, "x", "y"]}
    )
    out = rel.grouped_nunique(
        ray.data.from_arrow(tbl).repartition(2), ["k"], "v"
    ).sort_by([("k", "ascending")])
    assert out.column("n_distinct").to_pylist() == [1, 2]


def test_union_distinct_dedups_across_sides(ray_session):
    a = ray.data.from_arrow(pa.table({"x": pa.array([1, 1, 2], pa.int64())}))
    b = ray.data.from_arrow(pa.table({"y": pa.array([2, 3, None], pa.int64())}))
    out = rel.union_distinct(a, b, ["x"], ["y"])
    got = sorted(out.column("x").to_pylist(), key=lambda v: (v is None, v))
    assert got == [1, 2, 3, None]


def test_cross_join_broadcast_product_and_guard(ray_session):
    l = ray.data.from_arrow(pa.table({"a": pa.array([1, 2], pa.int64())}))
    r = ray.data.from_arrow(pa.table({"b": ["x", "y", "z"]}))
    out = rel.collect(rel.cross_join_broadcast(l, r))
    assert out.num_rows == 6
    assert sorted(set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))) == [
        (1, "x"), (1, "y"), (1, "z"), (2, "x"), (2, "y"), (2, "z")
    ]
    with pytest.raises(ValueError):
        rel.cross_join_broadcast(l, r, max_right_rows=2)
    with pytest.raises(ValueError):
        rel.cross_join_broadcast(l, ray.data.from_arrow(pa.table({"a": [9]})))
