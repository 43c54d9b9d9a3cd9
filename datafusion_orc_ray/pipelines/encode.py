"""The flagship pipelines: Parquet -> encoded stripes -> manifests, and
the inverse decode path (SURVEY.md §3.3 "Ray lifecycle equivalent").

Two encode modes, one core:

* ``encode_dataset`` — composable Dataset mode: any ``ray.data.Dataset``
  -> ``map_batches(StripeEncoder)`` actor pool -> manifest Dataset.
  Streaming, backpressured; stripe ids are content hashes (idempotent
  but not resume-planned).

* ``encode_parquet`` — the production mode for the 100 TB job: the unit
  of work is an input Parquet fragment (file x row-group), giving
  deterministic partition ids. Restart lists the manifest directory and
  re-runs only missing fragments (checkpoint/resume per the north rule).
  Reads are pruned to ``columns`` at the Parquet layer (S5).

Skew handling (north rule; SURVEY.md §4 "Skew / stragglers"): web corpora
are Zipf-skewed in ``lang`` (and url host). ``cluster_for_compression``
optionally co-locates rows by a salted key before encoding so dictionary/
FSST tables see homogeneous data: hot keys are SPLIT across
``ceil(freq / target_share)`` salt buckets (sampled frequencies), cold
keys share a catch-all — bounded partition sizes regardless of skew.
This is the pipeline's ONLY all-to-all shuffle and it is optional.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.encode import FragmentEncoder, StripeEncoder
from ..state import manifest as man


def plan_fragments(input_paths: list[str] | str) -> list[dict]:
    """Deterministic work list: one spec per (file, row_group), sorted by
    path for run-to-run stability (mirrors the reference's sort-by-path
    determinism in infer_schema, src/file_format.rs:90-96)."""
    import pyarrow.parquet as pq

    if isinstance(input_paths, str):
        if os.path.isdir(input_paths):
            paths = sorted(glob.glob(os.path.join(input_paths, "*.parquet")))
        else:
            paths = [input_paths]
    else:
        paths = sorted(input_paths)
    frags = []
    for p in paths:
        n_rg = pq.ParquetFile(p).num_row_groups
        frags.extend({"path": p, "row_group": rg} for rg in range(n_rg))
    return frags


def _cluster_cpus() -> int:
    import ray

    return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8


def _default_pool(whole_pipeline: bool = False) -> int:
    """Encoder actor-pool size. Fragment actors do their own read+encode+
    write (no upstream stage), so they may take every CPU; Dataset-mode
    encoders sit downstream of read tasks and must leave headroom
    (ray_guide: a pool that reserves every CPU starves the other stages)."""
    cpus = _cluster_cpus()
    return cpus if whole_pipeline else max(1, cpus - 2)


def fragment_stripe_id(spec: dict) -> str:
    import hashlib

    return hashlib.sha1(f"{spec['path']}:rg{spec['row_group']}".encode()).hexdigest()[:20]


def encode_parquet(
    input_paths: list[str] | str,
    out_dir: str,
    columns: list[str] | None = None,
    concurrency: int | tuple | None = None,
    resume: bool = True,
) -> ray.data.Dataset:
    """Resumable fragment-mode encode. Returns the manifest Dataset of
    stripes written THIS run (skipped fragments excluded)."""
    frags = plan_fragments(input_paths)
    if resume:
        done = man.completed_ids(out_dir)
        frags = [f for f in frags if fragment_stripe_id(f) not in done]
    if not frags:
        return ray.data.from_items([])
    if concurrency is None:
        concurrency = _default_pool(whole_pipeline=True)
    ds = ray.data.from_items(frags)
    return ds.map_batches(
        FragmentEncoder,
        fn_constructor_kwargs={"out_dir": out_dir, "columns": columns},
        batch_format="pyarrow",
        batch_size=1,  # one fragment per task: the resume/parallelism unit
        concurrency=concurrency,
    )


def encode_dataset(
    ds: ray.data.Dataset,
    out_dir: str,
    rows_per_stripe: int = 32768,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """Composable Dataset-mode encode (content-addressed stripe ids)."""
    if concurrency is None:
        concurrency = _default_pool()
    return ds.map_batches(
        StripeEncoder,
        fn_constructor_kwargs={"out_dir": out_dir},
        batch_format="pyarrow",
        batch_size=rows_per_stripe,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def decode_stripes(
    out_dir: str, columns: list[str] | None = None, concurrency: int | None = None
) -> ray.data.Dataset:
    from ..sources.stripes import read_stripes

    return read_stripes(out_dir, columns=columns, concurrency=concurrency)


def decode_to_parquet(
    out_dir: str,
    parquet_dir: str,
    columns: list[str] | None = None,
    min_rows_per_file: int = 100_000,
) -> None:
    """Decode stripes straight to partitioned Parquet — the streaming
    sink (never materializes; one part file per ~min_rows_per_file so a
    rerun can skip finished partitions)."""
    ds = decode_stripes(out_dir, columns=columns)
    try:
        ds.write_parquet(parquet_dir, min_rows_per_file=min_rows_per_file)
    except TypeError:  # older Ray releases
        ds.write_parquet(parquet_dir, num_rows_per_file=min_rows_per_file)


# ----------------------------------------------------------------- skew/salt

def salt_plan(
    ds: ray.data.Dataset, key: str, sample_rows: int = 50_000, target_share: float = 0.05
) -> dict[str, int]:
    """Sample key frequencies and assign each observed key a salt-bucket
    count: hot keys (share > target_share) are split into
    ceil(share/target_share) buckets. Broadcast-sized output (one entry
    per distinct key)."""
    import pyarrow.compute as pc

    sample = ds.select_columns([key]).limit(sample_rows)
    tbl = pa.concat_tables(
        sample.iter_batches(batch_format="pyarrow", batch_size=sample_rows)
    )
    vc = pc.value_counts(pc.fill_null(tbl.column(key).combine_chunks(), "\x00null"))
    n = sum(c.as_py() for c in vc.field("counts")) or 1
    plan = {}
    for kv, c in zip(vc.field("values"), vc.field("counts")):
        share = c.as_py() / n
        plan[kv.as_py()] = max(1, int(np.ceil(share / target_share)))
    return plan


def add_shard_column(
    ds: ray.data.Dataset,
    key: str = "lang",
    salt_col: str = "url",
    target_share: float = 0.05,
) -> ray.data.Dataset:
    """Append a ``__shard`` key = key + salt, hot keys split across
    ceil(freq/target_share) salt buckets (sampled frequencies)."""
    plan = salt_plan(ds, key, target_share=target_share)

    def add_shard(batch: pa.Table) -> pa.Table:
        import zlib

        import pyarrow.compute as pc

        keys = pc.fill_null(batch.column(key), "\x00null").to_pylist()
        salts = batch.column(salt_col).to_pylist()
        # zlib.crc32: stable across processes/runs (unlike builtin hash)
        shard = [
            f"{k}#{zlib.crc32(str(s).encode()) % plan.get(k, 1):03d}"
            for k, s in zip(keys, salts)
        ]
        return batch.append_column("__shard", pa.array(shard, pa.string()))

    return ds.map_batches(add_shard, batch_format="pyarrow")


def cluster_for_compression(
    ds: ray.data.Dataset,
    key: str = "lang",
    salt_col: str = "url",
    target_share: float = 0.05,
) -> ray.data.Dataset:
    """Co-locate rows by (key, salt) with hot keys split across salts —
    the skew-aware shuffle. Sorting by the combined shard key range-
    partitions the stream so each encode batch sees homogeneous data."""
    return add_shard_column(ds, key, salt_col, target_share).sort("__shard")


def encode_clustered(
    ds: ray.data.Dataset,
    out_dir: str,
    key: str = "lang",
    salt_col: str = "url",
    target_share: float = 0.05,
    rows_per_stripe: int = 32768,
) -> ray.data.Dataset:
    """Skew-aware clustered encode in ONE shuffle: shard key -> groupby ->
    encode each shard inside map_groups (a shard IS the encoder's
    partition, so symbol tables/dictionaries see homogeneous data).
    Bounded shards regardless of key skew because hot keys were salted."""
    from ..stages.encode import StripeEncoder

    sharded = add_shard_column(ds, key, salt_col, target_share)

    def encode_group(group: pa.Table) -> pa.Table:
        shard = group.column("__shard")[0].as_py() if group.num_rows else ""
        enc = StripeEncoder(out_dir, lineage=f"shard={shard}")
        body = group.drop_columns(["__shard"])
        rows = []
        for start in range(0, body.num_rows, rows_per_stripe):
            chunk = body.slice(start, rows_per_stripe)
            entry = enc.encode_one(chunk, lineage=f"shard={shard}:{start}")
            rows.append({k: entry[k] for k in _manifest_names()})
        return pa.Table.from_pylist(rows, schema=_manifest_schema())

    return sharded.groupby("__shard").map_groups(encode_group, batch_format="pyarrow")


def _manifest_schema():
    from ..stages.encode import manifest_row_schema

    return manifest_row_schema()


def _manifest_names():
    return _manifest_schema().names
