"""Randomized equivalence: hash_join vs DuckDB over small tables with
nulls and duplicate keys, across join types and forced execution paths
(broadcast / bucket / hot-key split). Hypothesis drives the data; the
oracle is the same SQL the driver's correctness gate uses."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_orc_ray.pipelines.relational import collect, hash_join

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys_st = st.lists(
    st.one_of(st.none(), st.integers(0, 6)), min_size=1, max_size=12
)

_SQL = {
    "inner": "SELECT l.k AS k, l.lv AS lv, r.rv AS rv FROM l JOIN r ON l.k = r.k",
    "left semi": "SELECT k, lv FROM l WHERE k IN (SELECT k FROM r WHERE k IS NOT NULL)",
    "left anti": (
        "SELECT k, lv FROM l WHERE k IS NULL "
        "OR k NOT IN (SELECT k FROM r WHERE k IS NOT NULL)"
    ),
    "left outer": (
        "SELECT l.k AS k, l.lv AS lv, r.rv AS rv FROM l LEFT JOIN r ON l.k = r.k"
    ),
    "full outer": (
        "SELECT coalesce(l.k, r.k2) AS k, l.lv AS lv, r.rv AS rv "
        "FROM l FULL JOIN (SELECT k AS k2, rv FROM r) r ON l.k = r.k2"
    ),
}


def _canon(df):
    df = df[sorted(df.columns)].astype(str)
    return sorted(map(tuple, df.values.tolist()))


@given(
    lk=keys_st,
    rk=keys_st,
    join_type=st.sampled_from(list(_SQL)),
    path=st.sampled_from(["broadcast", "bucket", "hot"]),
)
@settings(**_SETTINGS)
def test_hash_join_matches_duckdb(ray_session, lk, rk, join_type, path):
    left = pa.table(
        {"k": pa.array(lk, pa.int64()), "lv": pa.array(range(len(lk)), pa.int64())}
    )
    right = pa.table(
        {"k": pa.array(rk, pa.int64()), "rv": pa.array(range(len(rk)), pa.int64())}
    )
    kw = {}
    if path == "bucket":
        kw["broadcast_rows"] = 0
    elif path == "hot":
        kw["broadcast_rows"] = 0
        kw["hot_key_share"] = 0.0  # every sampled key counts as hot
    if join_type == "full outer" and path != "bucket":
        kw = {"broadcast_rows": 0}  # full outer is bucket-only by contract

    out = collect(
        hash_join(
            ray.data.from_arrow(left).repartition(2),
            ray.data.from_arrow(right).repartition(2),
            "k",
            "k",
            join_type=join_type,
            **kw,
        )
    )
    # full outer emits the surviving key under the LEFT name; normalize
    mine = out.to_pandas()

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    theirs = con.execute(_SQL[join_type]).fetchdf()
    if join_type == "full outer":
        # our full outer coalesces into the left key column; DuckDB's
        # k may be NULL only when BOTH sides were null-keyed rows
        pass
    assert _canon(mine) == _canon(theirs), (join_type, path, lk, rk)
