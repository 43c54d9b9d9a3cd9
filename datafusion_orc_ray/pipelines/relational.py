"""Relational operators over Ray Data (SURVEY.md §2.2: the operators the
reference exposes through DataFusion — projection, limit, count,
aggregation — plus the partial+final stats aggregate of E13/S4 and a
broadcast join, expressed Ray-Data-first).

Aggregations follow the scale pattern from the Ray guide: pre-aggregate
per batch inside ``map_batches`` (combiner), then a small ``groupby``
over partials — the all-to-all shuffle moves one row per (key, batch),
not one per input row.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..state import manifest as man


def collect(ds: ray.data.Dataset) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    if not tables:
        schema = ds.schema()
        base = getattr(schema, "base_schema", schema)
        return pa.Table.from_pylist([], schema=base)
    return pa.concat_tables(tables).combine_chunks()


def count_rows(ds: ray.data.Dataset) -> pa.Table:
    return pa.table({"n": pa.array([ds.count()], pa.int64())})


def topk(
    ds: ray.data.Dataset,
    key: str,
    k: int,
    columns: list[str],
    tiebreak: str | None = None,
) -> pa.Table:
    """Global top-k: per-batch top-k inside map_batches (combiner), then a
    tiny driver-side merge — no global sort shuffle. ``tiebreak`` (asc)
    makes the result deterministic under duplicate key values."""
    sort_keys = [(key, "descending")] + ([(tiebreak, "ascending")] if tiebreak else [])

    def batch_topk(batch: pa.Table) -> pa.Table:
        return batch.take(pc.select_k_unstable(batch, k, sort_keys)).select(columns)

    parts = collect(ds.map_batches(batch_topk, batch_format="pyarrow"))
    return parts.take(pc.select_k_unstable(parts, k, sort_keys))


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    exprs: dict[str, tuple[str, str]],
) -> pa.Table:
    """exprs: out_name -> (agg, column) with agg in sum|count|min|max.
    Partial per batch -> final groupby over partials."""

    def partial(batch: pa.Table) -> pa.Table:
        cols: dict = {k: batch.column(k) for k in keys}
        tbl = pa.table(cols)
        gb_cols = []
        for out, (agg, col) in exprs.items():
            if agg == "count":
                tbl = tbl.append_column(out, pa.array(np.ones(batch.num_rows, np.int64)))
                gb_cols.append((out, "sum"))
            else:
                tbl = tbl.append_column(out, batch.column(col))
                gb_cols.append((out, agg))
        res = pa.TableGroupBy(tbl, keys).aggregate(gb_cols)
        rename = {f"{out}_{agg if agg != 'count' else 'sum'}": out for out, (agg, _) in exprs.items()}
        return res.rename_columns([rename.get(c, c) for c in res.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    # final: the shuffle input is already tiny (one row per key per batch)
    merged = collect(partials)
    gb_cols = []
    for out, (agg, _) in exprs.items():
        final_agg = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}[agg]
        gb_cols.append((out, final_agg))
    res = pa.TableGroupBy(merged, keys).aggregate(gb_cols)
    rename = {}
    for out, (agg, _) in exprs.items():
        final_agg = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}[agg]
        rename[f"{out}_{final_agg}"] = out
    return res.rename_columns([rename.get(c, c) for c in res.column_names])


def manifest_column_stats(out_dir: str, column: str) -> pa.Table:
    """E13/S4: per-stripe stats live in the manifests; merging them is a
    tiny reduce — the full data is never rescanned (the reference stubs
    this entirely, src/file_format.rs:108-116; we do better)."""
    mins, maxs, n, nulls = [], [], 0, 0
    for e in man.load_manifest(out_dir):
        for c in json.loads(e["columns_json"]):
            if c["path"] == column:
                st = c.get("stats", {})
                if st.get("min") is not None:
                    mins.append(st["min"])
                if st.get("max") is not None:
                    maxs.append(st["max"])
                n += st.get("n", 0)
                nulls += st.get("null_count", 0)
    return pa.table(
        {
            "col_min": [min(mins) if mins else None],
            "col_max": [max(maxs) if maxs else None],
            "n": pa.array([n], pa.int64()),
            "null_count": pa.array([nulls], pa.int64()),
        }
    )


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """Partitioned hash join for two LARGE sides (ray_guide "Joins and
    lookups"): both sides get a bucket = crc32(key) % B column, one
    groupby co-locates matching buckets, and each bucket joins with a
    pandas merge inside map_groups. Skewed keys can be salted upstream
    with add_shard_column; B is the explicit partitioning knob."""
    import zlib

    import pandas as pd

    l_schema = getattr(left.schema(), "base_schema", left.schema())
    r_schema = getattr(right.schema(), "base_schema", right.schema())
    l_cols, r_cols = list(l_schema.names), list(r_schema.names)
    overlap = (set(l_cols) & set(r_cols)) - {left_key, right_key}
    if overlap:
        raise ValueError(f"ambiguous join columns: {sorted(overlap)}")
    combined = pa.schema(
        [l_schema.field(c) for c in l_cols]
        + [r_schema.field(c) for c in r_cols if c not in l_cols]
        + [pa.field("__bucket", pa.int32()), pa.field("__side", pa.int8())]
    )

    def tag(key_col: str, side: int):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col).to_pylist()
            b = [zlib.crc32(str(k).encode()) % n_buckets for k in keys]
            cols = []
            for f in combined:
                if f.name == "__bucket":
                    cols.append(pa.array(b, pa.int32()))
                elif f.name == "__side":
                    cols.append(pa.array(np.full(batch.num_rows, side, np.int8)))
                elif f.name in batch.column_names:
                    cols.append(batch.column(f.name))
                else:
                    cols.append(pa.nulls(batch.num_rows, f.type))
            return pa.Table.from_arrays(cols, schema=combined)

        return fn

    l_tag = left.map_batches(tag(left_key, 0), batch_format="pyarrow")
    r_tag = right.map_batches(tag(right_key, 1), batch_format="pyarrow")
    both = l_tag.union(r_tag)

    # the null-padded union coerces int columns to float in pandas;
    # restore each side's true dtypes after subselecting its rows
    int_cols = {
        f.name: "int" + str(f.type.bit_width)
        for f in combined
        if pa.types.is_integer(f.type) and f.name not in ("__bucket", "__side")
    }

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][l_cols]
        rg = g[g["__side"] == 1][list(r_cols)]
        for df, cols in ((lg, l_cols), (rg, r_cols)):
            for c in cols:
                if c in int_cols:
                    df[c] = df[c].astype(int_cols[c])
        return lg.merge(rg, left_on=left_key, right_on=right_key)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def broadcast_join_agg(
    left: ray.data.Dataset,
    right_tbl: pa.Table,
    left_key: str,
    right_key: str,
    right_val: str,
    agg_val: str,
) -> pa.Table:
    """Small-side broadcast join (ray_guide "Joins and lookups"): the
    dimension table is ray.put once; every task maps keys through it —
    no shuffle. Returns sum(agg_val) + count grouped by right_val."""
    lookup_ref = ray.put(
        dict(zip(right_tbl.column(right_key).to_pylist(), right_tbl.column(right_val).to_pylist()))
    )

    class JoinAgg:
        def __init__(self) -> None:
            self.lookup = ray.get(lookup_ref)  # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column(left_key).to_pylist()
            seg = pa.array([self.lookup.get(k) for k in keys], pa.string())
            tbl = pa.table({right_val: seg, agg_val: batch.column(agg_val)})
            res = pa.TableGroupBy(tbl, [right_val]).aggregate(
                [(agg_val, "sum"), (agg_val, "count")]
            )
            return res

    partials = collect(
        left.map_batches(JoinAgg, batch_format="pyarrow", concurrency=2)
    )
    res = pa.TableGroupBy(partials, [right_val]).aggregate(
        [(f"{agg_val}_sum", "sum"), (f"{agg_val}_count", "sum")]
    )
    return res.rename_columns([right_val, "total", "n_rows"])
