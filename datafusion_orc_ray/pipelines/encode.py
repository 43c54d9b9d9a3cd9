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
    # thin alias over the shared sizing helper (one policy to change)
    from ..util import cluster_cpus

    return cluster_cpus()


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

def _default_target_share(cpus: int | None = None) -> float:
    """Aim for ~2 shards per CPU slot so the clustered-encode map_groups
    stage has enough groups to keep the whole cluster busy (round 1's
    fixed 0.05 capped parallelism at ~20 groups — VERDICT r1 bench)."""
    c = cpus if cpus is not None else _cluster_cpus()
    return min(0.05, 0.5 / max(1, c))


def salt_plan(
    ds: ray.data.Dataset,
    key: str,
    sample_rows: int = 10_000,
    target_share: float | None = None,
) -> dict[str, int]:
    """Sample key frequencies and assign each observed key a salt-bucket
    count: hot keys (share > target_share) are split into
    ceil(share/target_share) buckets. Broadcast-sized output (one entry
    per distinct key)."""
    import pyarrow.compute as pc

    if target_share is None:
        target_share = _default_target_share()
    # per-block head slices, not a contiguous head: input already sorted
    # by the key (common after a prior clustering run) would make a head
    # sample see ONE key, leave every other hot key unsplit, and
    # over-split the first — exactly the skew the salt exists to prevent
    sample = (
        ds.select_columns([key])
        .map_batches(lambda b: b.slice(0, 256), batch_format="pyarrow")
        .limit(sample_rows)
    )
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
    target_share: float | None = None,
) -> ray.data.Dataset:
    """Append a ``__shard`` key = key + salt, hot keys split across
    ceil(freq/target_share) salt buckets (sampled frequencies). Fully
    vectorized: plan lookup via ``pc.index_in``, salt via one C-pass
    stable hash (the round-1 per-row crc32 loop was VERDICT r1 bench
    'weak')."""
    plan = salt_plan(ds, key, target_share=target_share)
    plan_keys = pa.array(list(plan.keys()), pa.string())
    plan_mods = np.array(list(plan.values()), dtype=np.uint64)

    def add_shard(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .relational import _stable_hash64

        keys = pc.fill_null(batch.column(key), "\x00null")
        idx = pc.index_in(keys, value_set=plan_keys)
        idx_np = idx.to_numpy(zero_copy_only=False)
        mods = np.where(
            np.isnan(idx_np.astype(np.float64)), 1, plan_mods[np.nan_to_num(idx_np).astype(np.int64)]
        ).astype(np.uint64)
        salts = _stable_hash64(batch.column(salt_col)) % np.maximum(mods, 1)
        shard = pc.binary_join_element_wise(
            keys, pa.array(salts.astype(np.int64)).cast(pa.string()), "#"
        )
        return batch.append_column("__shard", shard)

    return ds.map_batches(add_shard, batch_format="pyarrow")


def cluster_for_compression(
    ds: ray.data.Dataset,
    key: str = "lang",
    salt_col: str = "url",
    target_share: float | None = None,
) -> ray.data.Dataset:
    """Co-locate rows by (key, salt) with hot keys split across salts —
    the skew-aware shuffle. Sorting by the combined shard key range-
    partitions the stream so each encode batch sees homogeneous data."""
    return add_shard_column(ds, key, salt_col, target_share).sort("__shard")


def encode_clustered(
    ds: ray.data.Dataset | str,
    out_dir: str,
    key: str = "lang",
    salt_col: str = "url",
    target_share: float | None = None,
    rows_per_stripe: int = 32768,
    target_stripe_bytes: int = 32 << 20,
    mode: str = "local",
) -> ray.data.Dataset:
    """Clustered encode: stripes are single-``key`` (plus ``salt_col``
    sort order within), so dictionaries/FSST symbol tables always see
    homogeneous data.

    ``mode="local"`` (default, the scale path): ZERO shuffle. Every
    encode batch is sorted in-memory by (key, salt_col) and split at key
    boundaries into per-key stripes. Because symbol tables and
    dictionaries live PER STRIPE, within-stripe homogeneity is the whole
    compression win — global co-location adds nothing unless one key's
    run must span multiple batches, which byte-aware batch sizing makes
    rare. Cost over plain encode is one in-memory sort per batch.

    ``mode="global"``: a map-side shuffle — pass 1 streams the input
    once, writing key-run-aligned Arrow-IPC spill files plus a run
    index; pass 2 is a driver-planned fan-out where each task reads ONLY
    its key group's record batches (IPC random access) and encodes
    per-key stripes. No repartition barrier and no parquet re-encode
    (the r3 hive-spill design paid a full snappy round-trip plus
    write_tasks x shards files; 16.5 s -> see BENCH_r04). Spill file
    count = corpus_bytes / spill_batch_bytes, independent of key count.
    Skew (north rule): hot keys are split across tasks by MEASURED run
    bytes in the pass-2 plan — the bytes-exact successor of the sampled
    salt (``target_share`` is therefore ignored in this mode; it still
    governs ``cluster_for_compression``'s groupby path). The spill dir +
    ``_COMPLETE.json`` is the resume checkpoint between passes.

    Note: on the synthetic bench fixture the TEXT vocabulary is shared
    across langs by construction (fixtures._vocab), so lang-clustering
    cannot improve text compression there; the gain shows on the url
    column and on real per-lang corpora."""
    if isinstance(ds, str) and mode == "local":
        # parquet path/dir input: feed the encoder straight from row
        # groups read IN-TASK — the raw corpus never crosses the object
        # store (the same reason plain fragment encode is the fast path)
        return ray.data.from_items(plan_fragments(ds)).map_batches(
            _FragmentFed,
            fn_constructor_kwargs={
                "inner_cls": _ClusteredBatchEncoder,
                "inner_kwargs": {
                    "out_dir": out_dir,
                    "key": key,
                    "salt_col": salt_col,
                    "rows_per_stripe": rows_per_stripe,
                    "target_stripe_bytes": target_stripe_bytes,
                },
            },
            batch_format="pyarrow",
            batch_size=1,
            concurrency=_default_pool(),
        )
    if mode == "local":
        # batch rows sized from a tiny probe so wide web rows still get
        # ~target_stripe_bytes batches; the encoder then splits each
        # batch at key boundaries (byte-capped) into per-key stripes
        probe = ds.take_batch(256, batch_format="pyarrow")
        bpr = max(1.0, probe.nbytes / max(1, probe.num_rows))
        batch_rows = max(256, min(rows_per_stripe, int(target_stripe_bytes / bpr)))
        return ds.map_batches(
            _ClusteredBatchEncoder,
            fn_constructor_kwargs={
                "out_dir": out_dir,
                "key": key,
                "salt_col": salt_col,
                "rows_per_stripe": rows_per_stripe,
                "target_stripe_bytes": target_stripe_bytes,
            },
            batch_format="pyarrow",
            batch_size=batch_rows,
            zero_copy_batch=True,
            concurrency=_default_pool(),
        )
    if mode != "global":
        raise ValueError(f"mode must be 'local' or 'global', got {mode!r}")
    return _encode_global(
        ds,
        out_dir,
        key=key,
        salt_col=salt_col,
        rows_per_stripe=rows_per_stripe,
        target_stripe_bytes=target_stripe_bytes,
    )


class _FragmentFed:
    """Feeds an encode/spill actor straight from parquet row groups
    read IN-TASK (one spec row = one row group = one inner call): the
    raw corpus never crosses the object store — at bench scale that hop
    alone costs >1 s of shared-bus bandwidth, and on a multi-node
    cluster it is a needless full-corpus network copy."""

    def __init__(self, inner_cls: type, inner_kwargs: dict) -> None:
        self.inner = inner_cls(**inner_kwargs)

    def __call__(self, specs: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = [
            self.inner(
                pq.ParquetFile(spec["path"]).read_row_group(spec["row_group"])
            )
            for spec in specs.to_pylist()
        ]
        return (
            outs[0]
            if len(outs) == 1
            else pa.concat_tables(outs, promote_options="default")
        )


def _spill_codec() -> str:
    """IPC body compression for shuffle spill files: lz4 frame when the
    wheel carries it (fastest), else zstd. Spill is transient shuffle
    state, not durable data — decode speed beats ratio."""
    try:
        if pa.Codec.is_available("lz4"):
            return "lz4"
    except Exception:
        pass
    return "zstd"


def _est_dataset_bytes(ds: ray.data.Dataset) -> int:
    """In-memory byte estimate without executing the pipeline: Ray's
    metadata estimate when present, else a 256-row probe is the floor."""
    est = ds.size_bytes()
    if est:
        return int(est)
    probe = ds.limit(256).take_batch(256, batch_format="pyarrow")
    return max(1, probe.nbytes)


# one schema for BOTH the empty- and nonempty-batch returns (ADVICE r4:
# the empty path typed batch_index int32 while from_pylist inferred
# int64, so mixed blocks could fail Ray's concat in iter_batches)
_SPILL_INDEX_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("batch_index", pa.int64()),
        ("shard", pa.string()),
        ("rows", pa.int64()),
        ("bytes", pa.int64()),
    ]
)


class _ShardSpillWriter:
    """Pass-1 stage of the global clustered encode: a map-side shuffle
    writer. Each input batch (sized ~``batch_bytes``) is sorted by
    (key, salt_col), then written as ONE Arrow-IPC file whose record
    batches are aligned to key runs; the returned index rows
    (path, batch_index, shard, rows, bytes) are the shuffle's "map
    output index". Pass 2 reads ONLY the record batches of its key
    group — random access via the IPC footer — so no parquet re-encode,
    no hive directory discovery, and file count = corpus_bytes /
    batch_bytes regardless of key count (the r3 hive design paid
    write_tasks x shards files plus a full snappy round-trip).

    No salt column: skew is defeated downstream — ``_plan_spill_tasks``
    splits a hot key's runs across as many tasks as its measured bytes
    require (a dynamic, bytes-exact equivalent of the sampled salt the
    groupby-based design needed, where one key had to fit one task)."""

    def __init__(self, spill_dir: str, key: str, salt_col: str) -> None:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        from .. import io as dio

        self.spill_dir = spill_dir
        self.key = key
        self.salt_col = salt_col
        self.codec = _spill_codec()
        dio.makedirs(spill_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import uuid

        import pyarrow.compute as pc

        from .. import io as dio

        if batch.num_rows == 0:
            return _SPILL_INDEX_SCHEMA.empty_table()
        ck = batch.column(self.key)
        if isinstance(ck, pa.ChunkedArray):
            ck = ck.combine_chunks()
        if ck.null_count and pa.types.is_string(ck.type):
            ck = pc.fill_null(ck, "\x00null")
        if not pa.types.is_string(ck.type):
            ck = ck.cast(pa.string())
        tmp = batch.append_column("__shard", ck)
        keys = [("__shard", "ascending")]
        if self.salt_col in batch.column_names:
            keys.append((self.salt_col, "ascending"))
        tmp = tmp.sort_by(keys)
        shards = tmp.column("__shard").to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.concatenate([[True], shards[1:] != shards[:-1]]))
        bounds = np.append(bounds, len(shards))
        body = tmp.drop_columns(["__shard"]).combine_chunks()

        path = dio.join(self.spill_dir, f"run-{uuid.uuid4().hex}.arrow")
        fs, p = dio.resolve(path)
        opts = pa.ipc.IpcWriteOptions(compression=self.codec)
        rows = []
        with fs.open_output_stream(p) as sink:
            with pa.ipc.new_file(sink, body.schema, options=opts) as w:
                bi = 0
                for i in range(len(bounds) - 1):
                    s, e = int(bounds[i]), int(bounds[i + 1])
                    run = body.slice(s, e - s)
                    n_batches = 0
                    for rb in run.to_batches():
                        w.write_batch(rb)
                        n_batches += 1
                    # a run is normally ONE record batch (body is
                    # combined); guard multi-chunk edges by indexing each
                    for k in range(n_batches):
                        part = run.num_rows if n_batches == 1 else run.to_batches()[k].num_rows
                        rows.append(
                            {"path": path, "batch_index": bi + k,
                             "shard": str(shards[s]), "rows": int(part),
                             "bytes": int(run.nbytes // max(1, n_batches))}
                        )
                    bi += n_batches
        return pa.Table.from_pylist(rows, schema=_SPILL_INDEX_SCHEMA)


class _SpillTaskEncoder:
    """Pass-2 stage: one task per planned shard group. Reads exactly its
    shards' record batches from the spill files (IPC random access),
    re-sorts each shard by the salt column (restores dictionary/FSST
    locality lost at spill-file boundaries), and emits per-shard stripes
    via the same byte-capped / tiny-run-coalescing policy as local mode."""

    def __init__(
        self,
        out_dir: str,
        salt_col: str = "url",
        rows_per_stripe: int = 32768,
        target_stripe_bytes: int = 32 << 20,
    ) -> None:
        from ..stages.encode import StripeEncoder

        self.enc = StripeEncoder(out_dir)
        self.salt_col = salt_col
        self.rows_per_stripe = rows_per_stripe
        self.target_stripe_bytes = target_stripe_bytes
        self.seq = 0

    def __call__(self, specs: pa.Table) -> pa.Table:
        import json as _json

        from .. import io as dio

        all_rows: list[dict] = []
        for spec in specs.to_pylist():
            groups = _json.loads(spec["task_json"])
            readers: dict[str, pa.ipc.RecordBatchFileReader] = {}
            tables, labels = [], []
            for g in groups:
                parts = []
                for path, bi in g["parts"]:
                    r = readers.get(path)
                    if r is None:
                        fs, p = dio.resolve(path)
                        r = pa.ipc.open_file(fs.open_input_file(p))
                        readers[path] = r
                    parts.append(pa.Table.from_batches([r.get_batch(int(bi))]))
                t = pa.concat_tables(parts, promote_options="default")
                if self.salt_col in t.column_names:
                    t = t.sort_by(self.salt_col)
                tables.append(t)
                labels.append(g["shard"])
            if not tables:
                continue
            body = pa.concat_tables(tables, promote_options="default").combine_chunks()
            bounds = np.cumsum([0] + [t.num_rows for t in tables])
            rows, self.seq = _emit_keyed_stripes(
                self.enc, body, bounds, labels,
                self.rows_per_stripe, self.target_stripe_bytes, self.seq,
            )
            all_rows.extend(rows)
        return pa.Table.from_pylist(all_rows, schema=_manifest_schema())


def _plan_spill_tasks(index_rows: list[dict], task_bytes: int) -> list[dict]:
    """Greedy shard-group packing: runs of one shard stay together (split
    only when the shard alone exceeds ``task_bytes``); small shards are
    packed into shared tasks. Driver-side over the map-output index —
    O(spill runs) rows, ~100 B each (at 100 TB / 256 MB spill batches x
    ~64 shards that is a few million rows: acceptable on a job driver,
    and the packing is a single sort + linear scan)."""
    import json as _json

    by_shard: dict[str, list[dict]] = {}
    for r in index_rows:
        by_shard.setdefault(r["shard"], []).append(r)
    tasks: list[list[dict]] = []
    cur: list[dict] = []
    cur_bytes = 0

    def close() -> None:
        nonlocal cur, cur_bytes
        if cur:
            tasks.append(cur)
            cur, cur_bytes = [], 0

    for shard in sorted(by_shard):
        runs = by_shard[shard]
        group: dict = {"shard": shard, "parts": []}
        g_bytes = 0
        for r in runs:
            group["parts"].append([r["path"], r["batch_index"]])
            g_bytes += r["bytes"]
            if g_bytes >= task_bytes:  # huge shard: split across tasks
                close()
                tasks.append([group])
                group, g_bytes = {"shard": shard, "parts": []}, 0
        if group["parts"]:
            if cur_bytes + g_bytes > task_bytes:
                close()
            cur.append(group)
            cur_bytes += g_bytes
    close()
    return [{"task_json": _json.dumps(t)} for t in tasks]


def _encode_global(
    ds: ray.data.Dataset | str,
    out_dir: str,
    key: str,
    salt_col: str,
    rows_per_stripe: int,
    target_stripe_bytes: int,
    reuse_spill: bool = False,
) -> ray.data.Dataset:
    """Global clustered encode = map-side shuffle (pass 1: streaming
    shard+sort+IPC spill with a run index) + driver-planned reduce
    (pass 2: per-shard-group read+encode). The spill dir plus its
    ``_COMPLETE.json`` index is the resume checkpoint between passes
    (``reuse_spill=True`` skips pass 1 when present)."""
    import json as _json

    from .. import io as dio

    spill = dio.join(out_dir, "_spill")
    marker = dio.join(spill, "_COMPLETE.json")
    fs, marker_p = dio.resolve(marker)
    import pyarrow.fs as pafs

    have_marker = fs.get_file_info(marker_p).type != pafs.FileType.NotFound
    cpus = _cluster_cpus()
    if reuse_spill and have_marker:
        index_rows = _json.loads(dio.read_bytes(marker))
    else:
        # delete via the filesystem layer, not shutil: shutil.rmtree is a
        # no-op on object-store URIs (errors swallowed), so a stale
        # _spill from a previous run would surface as ghost rows
        sfs, sp = dio.resolve(spill)
        try:
            sfs.delete_dir(sp)
        except FileNotFoundError:
            pass
        if isinstance(ds, str):
            # parquet path/dir input: spill writers read row groups
            # in-task (see _FragmentFed) — spill run size = row group.
            # Plain TASKS, not an actor pool: the writer holds no
            # cross-batch state and a second pool's cold start + ramp
            # cost ~1.5 s of an ~4 s pass (measured at sf0.1/32)
            def spill_fragments(specs: pa.Table) -> pa.Table:
                return _FragmentFed(
                    _ShardSpillWriter,
                    {"spill_dir": spill, "key": key, "salt_col": salt_col},
                )(specs)

            index = ray.data.from_items(plan_fragments(ds)).map_batches(
                spill_fragments, batch_format="pyarrow", batch_size=1
            )
        else:
            est = _est_dataset_bytes(ds)
            # spill batches: big enough to bound file count, small enough
            # to keep every slot busy at bench scale
            batch_bytes = int(min(256 << 20, max(32 << 20, est / (2 * cpus))))
            n_rows = ds.count()  # metadata pushdown on parquet reads
            bpr = max(1.0, est / max(1, n_rows))
            batch_rows = max(256, int(batch_bytes / bpr))
            index = ds.map_batches(
                _ShardSpillWriter,
                fn_constructor_kwargs={
                    "spill_dir": spill,
                    "key": key,
                    "salt_col": salt_col,
                },
                batch_format="pyarrow",
                batch_size=batch_rows,
                zero_copy_batch=True,
                concurrency=_default_pool(),
            )
        index_rows = []
        for b in index.iter_batches(batch_format="pyarrow", batch_size=65536):
            index_rows.extend(b.to_pylist())
        dio.write_bytes_atomic(marker, _json.dumps(index_rows).encode())
    if not index_rows:
        return ray.data.from_items([])
    total = sum(r["bytes"] for r in index_rows)
    # one task wave: total/cpus (floor 32 MB) measured 5.1 s vs 6.0 s
    # for the old total/(2*cpus) double wave at sf0.1/32 CPUs
    task_bytes = int(min(256 << 20, max(32 << 20, total / cpus)))
    specs = _plan_spill_tasks(index_rows, task_bytes)

    # plain tasks for the same cold-start reason as the spill pass: the
    # per-stripe codec trials an actor's EncoderState would cache are
    # per-shard-group here anyway (batch_size=1)
    def encode_group(batch: pa.Table) -> pa.Table:
        return _SpillTaskEncoder(
            out_dir,
            salt_col=salt_col,
            rows_per_stripe=rows_per_stripe,
            target_stripe_bytes=target_stripe_bytes,
        )(batch)

    return ray.data.from_items(specs).map_batches(
        encode_group, batch_format="pyarrow", batch_size=1
    )


class _ClusteredBatchEncoder:
    """Encode actor for the clustered paths: sorts each batch by
    (key, salt_col) — url-host runs share dictionary/FSST locality — and
    emits one stripe per key run, so symbol tables always see
    homogeneous data. The key column is dropped in "global" mode (it is
    synthetic) and kept in "local" mode (it is a real data column)."""

    def __init__(
        self,
        out_dir: str,
        key: str = "lang",
        salt_col: str = "url",
        rows_per_stripe: int = 32768,
        target_stripe_bytes: int = 32 << 20,
    ) -> None:
        from ..stages.encode import StripeEncoder

        self.enc = StripeEncoder(out_dir)
        self.key = key
        self.salt_col = salt_col
        self.rows_per_stripe = rows_per_stripe
        self.target_stripe_bytes = target_stripe_bytes
        self.synthetic = key == "rstp_shard"
        self.seq = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ck = batch.column(self.key)
        if isinstance(ck, pa.ChunkedArray):
            ck = ck.combine_chunks()
        if ck.null_count and pa.types.is_string(ck.type):
            ck = pc.fill_null(ck, "\x00null")  # cluster key only; data untouched
        tmp = batch.append_column("__ck", ck)
        keys = [("__ck", "ascending")]
        if self.salt_col in batch.column_names:
            keys.append((self.salt_col, "ascending"))
        tmp = tmp.sort_by(keys)
        shards = tmp.column("__ck").to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.concatenate([[True], shards[1:] != shards[:-1]]))
        bounds = np.append(bounds, len(shards))
        drop = ["__ck"] + ([self.key] if self.synthetic else [])
        body = tmp.drop_columns(drop)
        labels = [str(shards[int(bounds[i])]) for i in range(len(bounds) - 1)]
        rows, self.seq = _emit_keyed_stripes(
            self.enc, body, bounds, labels,
            self.rows_per_stripe, self.target_stripe_bytes, self.seq,
        )
        return pa.Table.from_pylist(rows, schema=_manifest_schema())


def _emit_keyed_stripes(
    enc,
    body: pa.Table,
    bounds: np.ndarray,
    labels: list[str],
    rows_per_stripe: int,
    target_stripe_bytes: int,
    seq: int,
) -> tuple[list[dict], int]:
    """Shared per-key stripe emission: ``body`` holds contiguous key runs
    delimited by ``bounds`` (len(labels)+1 offsets); each run becomes one
    or more byte-capped stripes, and tiny runs (rare keys) are coalesced
    into contiguous "mixed" stripes — per-stripe overhead otherwise eats
    the clustering gain. Returns (manifest rows, next seq)."""
    bytes_per_row = max(1.0, body.nbytes / max(1, body.num_rows))
    cap = max(256, min(rows_per_stripe, int(target_stripe_bytes / bytes_per_row)))
    min_rows = max(256, cap // 8)
    rows: list[dict] = []

    def emit(start: int, stop: int, label: str) -> None:
        nonlocal seq
        for s in range(start, stop, cap):
            chunk = body.slice(s, min(cap, stop - s))
            entry = enc.encode_one(chunk, lineage=f"shard={label}:{seq}")
            seq += 1
            rows.append({k: entry.get(k) for k in _manifest_names()})

    mixed_start = None
    for i in range(len(bounds) - 1):
        run_start, run_stop = int(bounds[i]), int(bounds[i + 1])
        if run_stop - run_start < min_rows:
            if mixed_start is None:
                mixed_start = run_start
            continue
        if mixed_start is not None:
            emit(mixed_start, run_start, "mixed")
            mixed_start = None
        emit(run_start, run_stop, labels[i])
    if mixed_start is not None:
        emit(mixed_start, int(bounds[-1]), "mixed")
    return rows, seq




def _manifest_schema():
    from ..stages.encode import manifest_row_schema

    return manifest_row_schema()


def _manifest_names():
    return _manifest_schema().names


# ----------------------------------------------------------------- compaction

def plan_compaction(
    out_dir: str, target_bytes: int = 64 << 20, min_members: int = 2
) -> list[dict]:
    """Greedy plan: consecutive (path-sorted) stripes smaller than
    ``target_bytes`` raw are grouped until the group reaches the target.
    Returns group specs [{members: [manifest entries...]}]."""
    entries = sorted(man.load_manifest(out_dir), key=lambda e: e["path"])
    groups, cur, cur_bytes = [], [], 0
    for e in entries:
        raw = e.get("raw_bytes", 0)
        if raw >= target_bytes:
            continue  # already big enough
        cur.append(e)
        cur_bytes += raw
        if cur_bytes >= target_bytes:
            if len(cur) >= min_members:
                groups.append({"members": cur})
            cur, cur_bytes = [], 0
    if len(cur) >= min_members:
        groups.append({"members": cur})
    return groups


class _CompactWorker:
    """One task per compaction group: decode members, concat, encode ONE
    merged stripe whose manifest lists ``replaces`` (the commit point —
    once durable, members are invisible to readers/resume even before
    their files are cleaned), then best-effort delete member files."""

    def __init__(self, out_dir: str, schema_b64: str) -> None:
        import base64

        from ..stages.encode import StripeEncoder

        self.out_dir = out_dir
        self.enc = StripeEncoder(out_dir)
        self.schema = pa.schema([]) if not schema_b64 else __import__(
            "pyarrow"
        ).ipc.read_schema(pa.py_buffer(base64.b64decode(schema_b64)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        import json as _json

        from .. import io as dio
        from .. import stripe as stripe_mod
        from ..state.manifest import COMPACT_PREFIX

        rows = []
        for spec in batch.to_pylist():
            members = _json.loads(spec["members_json"])
            member_ids = [m["stripe_id"] for m in members]
            # inherit transitively so resume never re-encodes an ancestor
            replaces = sorted(
                set(member_ids)
                | {rid for m in members for rid in m.get("replaces", [])}
            )
            new_id = COMPACT_PREFIX + hashlib.sha1(
                ",".join(sorted(member_ids)).encode()
            ).hexdigest()[:20]
            tables = [
                stripe_mod.decode_file(m["path"], unified_schema=self.schema)
                for m in members
            ]
            merged = pa.concat_tables(tables).combine_chunks()
            # through encode_one: compacted stripes keep per-column stats/
            # codec metrics, so scan pruning still works after compaction
            entry = self.enc.encode_one(
                merged,
                stripe_id=new_id,
                lineage=f"compact:{len(members)}",
                extra_entry={"replaces": replaces},
            )
            # cleanup (idempotent, best-effort — the replaces list is the
            # source of truth; leftover files are ignored by readers)
            for m in members:
                for p in man.stripe_paths(self.out_dir, m["stripe_id"]):
                    try:
                        fs, fp = dio.resolve(p)
                        fs.delete_file(fp)
                    except Exception:
                        pass
            rows.append({k: entry.get(k) for k in _manifest_names()})
        return pa.Table.from_pylist(rows, schema=_manifest_schema())


def compact_stripes(
    out_dir: str, target_bytes: int = 64 << 20, min_members: int = 2
) -> int:
    """Merge small stripes into ~target_bytes ones (distributed, one Ray
    task per group; crash-safe via replaces-tombstones). Returns the
    number of merged stripes written."""
    import base64
    import json as _json

    groups = plan_compaction(out_dir, target_bytes, min_members)
    if not groups:
        return 0
    from ..sources.stripes import stripes_schema

    schema_b64 = base64.b64encode(stripes_schema(out_dir).serialize().to_pybytes()).decode()
    specs = [{"members_json": _json.dumps(g["members"])} for g in groups]
    mf = ray.data.from_items(specs).map_batches(
        _CompactWorker,
        fn_constructor_kwargs={"out_dir": out_dir, "schema_b64": schema_b64},
        batch_format="pyarrow",
        batch_size=1,
        concurrency=_default_pool(),
    )
    n = mf.count()
    # compaction is the natural maintenance point: consolidate manifest
    # rows so later metadata calls GET one snapshot + the delta
    man.write_snapshot(out_dir)
    return n
