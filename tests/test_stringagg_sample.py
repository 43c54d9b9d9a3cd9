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
