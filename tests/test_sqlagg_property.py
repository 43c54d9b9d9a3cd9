"""Property tests for the SQL pushdown planners (no Ray): for any
generated table/batching and any supported ORDER BY ... LIMIT shape,
simulating the partial/final pipeline over arbitrary batch splits must
equal DuckDB executing the original query over the whole table."""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from datafusion_orc_ray.sources import sqlagg

COLS = ["a", "b", "c"]


def _table(rows: list[tuple], ) -> pa.Table:
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.string()),
            "c": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


row_st = st.tuples(
    st.one_of(st.none(), st.integers(-50, 50)),
    st.one_of(st.none(), st.text(alphabet="abxyz", max_size=3)),
    st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                   min_value=-1e6, max_value=1e6)),
)

order_item_st = st.tuples(
    st.sampled_from(COLS + ["a % 5", "1", "2"]),
    st.sampled_from(["", " ASC", " DESC", " DESC NULLS FIRST", " ASC NULLS LAST"]),
)


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(row_st, min_size=0, max_size=120),
    n_batches=st.integers(1, 6),
    select_cols=st.lists(st.sampled_from(COLS), min_size=1, max_size=3, unique=True),
    order_items=st.lists(order_item_st, min_size=1, max_size=2),
    limit=st.integers(1, 25),
)
def test_topk_pushdown_equals_duckdb(rows, n_batches, select_cols, order_items, limit):
    t = _table(rows)
    # always add the unique-ish full column list as final tie-break so
    # result comparison is deterministic across plans
    ob = ", ".join(f"{e}{sfx}" for e, sfx in order_items)
    ob += (", " if ob else "") + "a NULLS LAST, b NULLS LAST, c NULLS LAST"
    q = f"SELECT {', '.join(select_cols)} FROM t ORDER BY {ob} LIMIT {limit}"
    plan = sqlagg.plan_topk_pushdown(q, "t", t.schema)
    # positional keys referencing a position beyond the select list veto
    if plan is None:
        # only legitimate veto in this generator: a positional order key
        # beyond the select list
        assert any(
            e in ("1", "2") and int(e) > len(select_cols) for e, _ in order_items
        ), q
        return

    step = max(1, (t.num_rows + n_batches - 1) // n_batches)
    batches = [t.slice(i, step) for i in range(0, max(t.num_rows, 1), step)]
    fn = sqlagg.run_partial(plan.partial_sql)
    parts = [fn(b) for b in batches if b.num_rows]
    con = duckdb.connect()
    try:
        if parts:
            partials = pa.concat_tables(parts)
        else:
            con.register("t", t.schema.empty_table())
            partials = con.sql(plan.partial_sql.replace("__batch", "t")).fetch_arrow_table()
        con.register("__partials", partials)
        got = con.sql(plan.final_sql).fetch_arrow_table()
        con.register("t", t)
        want = con.sql(q).fetch_arrow_table()
    finally:
        con.close()
    assert got.schema.names == want.schema.names
    g, w = got.to_pydict(), want.to_pydict()
    for col in g:
        for x, y in zip(g[col], w[col], strict=True):
            ok = (x == y) or (
                isinstance(x, float) and isinstance(y, float)
                and math.isnan(x) and math.isnan(y)
            )
            assert ok, (q, col, x, y)
