"""External-ORC ingest: read real ORC files (written by any ORC writer)
as a ``ray.data.Dataset`` and re-encode them into RSTP stripes.

This closes the interop loop with the reference, which reads
external-writer ORC (its golden fixture tests/basic/data/
alltypes.snappy.orc — the same file our conformance test uses): a user
of the reference can point this engine at their existing ORC data and
keep their pipelines. One decode task per (file, stripe) — the ORC
stripe is the parallelism unit, mirroring the reference's
stripe-granular scan (src/physical_exec.rs:79-82).

Gated on pyarrow's optional orc module (import-try per the environment
rules); everything else in the engine works without it.
"""

from __future__ import annotations

import ray.data

try:
    from pyarrow import orc as pa_orc

    HAVE_ORC = True
except ImportError:  # pragma: no cover - environment without pyarrow.orc
    pa_orc = None
    HAVE_ORC = False


def _require_orc() -> None:
    if not HAVE_ORC:
        raise NotImplementedError(
            "pyarrow was built without ORC support; external-ORC ingest is "
            "unavailable in this environment"
        )


def plan_orc_stripes(paths: list[str] | str) -> list[dict]:
    """Deterministic work list: one spec per (file, stripe), sorted by
    path (same sort-for-determinism as parquet fragment planning)."""
    import glob
    import os

    _require_orc()
    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(glob.glob(os.path.join(paths, "*.orc")))
        else:
            paths = [paths]
    else:
        paths = sorted(paths)
    specs = []
    for p in paths:
        f = pa_orc.ORCFile(p)
        specs.extend({"path": p, "stripe": i} for i in range(f.nstripes))
    if not specs and paths:
        # a valid ORC file CAN hold zero stripes (empty table): emit one
        # schema-carrying marker spec so callers get an empty Dataset
        # with the right schema instead of a spurious file-not-found
        specs.append({"path": paths[0], "stripe": -1})
    return specs


def read_orc(
    paths: list[str] | str,
    columns: list[str] | None = None,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """External ORC -> Dataset; one decode task per ORC stripe, column
    pruning pushed into the ORC reader."""
    _require_orc()
    specs = plan_orc_stripes(paths)
    if not specs:
        raise FileNotFoundError(f"no ORC files under {paths!r}")
    cols = columns

    def decode(batch):
        import pyarrow as pa

        for row in batch.to_pylist():
            f = pa_orc.ORCFile(row["path"])
            if row["stripe"] < 0:  # zero-stripe marker: empty, typed
                sch = f.schema
                if cols is not None:
                    sch = pa.schema([sch.field(c) for c in cols])
                yield sch.empty_table()
                continue
            t = f.read_stripe(row["stripe"], columns=cols)
            yield t if isinstance(t, pa.Table) else pa.Table.from_batches([t])

    return ray.data.from_items(specs).map_batches(
        decode, batch_format="pyarrow", batch_size=1, concurrency=concurrency
    )


_ORC_MANIFEST_SCHEMA = None


def _orc_manifest_schema():
    import pyarrow as pa

    global _ORC_MANIFEST_SCHEMA
    if _ORC_MANIFEST_SCHEMA is None:
        _ORC_MANIFEST_SCHEMA = pa.schema(
            [("path", pa.string()), ("rows", pa.int64()), ("bytes", pa.int64())]
        )
    return _ORC_MANIFEST_SCHEMA


def write_orc(
    ds: ray.data.Dataset,
    out_dir: str,
    compression: str = "snappy",
    batch_rows: int | None = None,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Dataset -> directory of real ORC files consumable by ANY external
    ORC reader (VERDICT r4 #4: the reference's whole ecosystem assumes
    ORC bytes exist — register_orc/read_orc over files on disk,
    src/lib.rs:107-118 — so emitting them closes the write half of the
    interop loop our read_orc opened). One ORC file per input block
    (``batch_rows`` regroups first when set), written inside the task
    that holds the block — no driver materialization, files land in
    parallel, and the returned manifest Dataset (path, rows, bytes) is
    the resumable-output record. Compression defaults to snappy to
    mirror the reference fixtures' codec. Type note: ORC's native
    timestamp precision is nanoseconds, so external readers hand
    non-ns timestamp columns back as timestamp[ns] — values identical,
    cast to recover the original unit."""
    _require_orc()
    from .. import io as dio

    dio.makedirs(out_dir)

    def write_batch(batch):
        import uuid

        import pyarrow as pa

        if batch.num_rows == 0:
            return _orc_manifest_schema().empty_table()
        path = dio.join(out_dir, f"part-{uuid.uuid4().hex}.orc")
        fs, p = dio.resolve(path)
        with fs.open_output_stream(p) as sink:
            pa_orc.write_table(batch, sink, compression=compression)
        return pa.table(
            {
                "path": [path],
                "rows": pa.array([batch.num_rows], pa.int64()),
                "bytes": pa.array([dio.file_size(path)], pa.int64()),
            }
        )

    kwargs = {"batch_format": "pyarrow", "concurrency": concurrency}
    if batch_rows is not None:
        kwargs["batch_size"] = batch_rows
    return ds.map_batches(write_batch, **kwargs)


def ingest_orc(
    paths: list[str] | str,
    out_dir: str,
    columns: list[str] | None = None,
    rows_per_stripe: int = 32768,
) -> ray.data.Dataset:
    """External ORC -> RSTP stripe dir (manifest Dataset out)."""
    from ..pipelines.encode import encode_dataset

    return encode_dataset(read_orc(paths, columns), out_dir, rows_per_stripe=rows_per_stripe)
