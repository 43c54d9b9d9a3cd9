"""StripeDatasource — the stripe format as a first-class
``ray.data.Datasource`` (the user-extension surface SURVEY §2.4 maps to
the reference's FileFormat/FileSource trait impls, src/file_format.rs).

Compared to the from_items+map_batches scan, the datasource hands Ray
per-task row/byte metadata from the manifests, so the streaming executor
can size blocks, report progress, and schedule with real size estimates;
stats-based stripe pruning and projection/residual-filter pushdown work
exactly as in ``read_stripes``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask

from ..state import manifest

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa


class StripeDatasource(Datasource):
    def __init__(
        self,
        out_dir: str,
        columns: list[str] | None = None,
        predicate: tuple[str, str, object] | list | None = None,
        rows_per_block: int = 32768,
        split_bytes: int = 128 << 20,
    ) -> None:
        from ..stripe import _pred_list, pred_flat_conjuncts
        from .stripes import _stats_may_match, stripes_schema

        preds = _pred_list(predicate)
        # or-group SHAPE validation (r5 review finding #3): an empty
        # disjunct means (empty AND) == TRUE, but the residual filter
        # would silently skip it (stronger filter) or crash on an
        # all-empty group — and stats pruning would disagree. Reject on
        # the driver before any task launches.
        from ..stripe import _is_or

        for p in preds or []:
            if _is_or(p):
                if not p[1] or any(not d for d in p[1]):
                    raise ValueError(
                        "or-group predicate with an empty disjunct list: "
                        "an empty conjunct list means TRUE — drop the "
                        "predicate instead of passing a vacuous branch"
                    )
        for p in pred_flat_conjuncts(preds):  # incl. inside or-groups
            if p[1] not in ("<", "<=", ">", ">=", "==", "isnull", "notnull"):
                # fail fast on the driver: an unsupported op would pass
                # stats pruning as "cannot prune" and then crash every
                # read task mid-job with a bare KeyError from the
                # residual filter
                raise ValueError(
                    f"unsupported predicate op {p[1]!r} "
                    "(use one of <, <=, >, >=, ==, isnull, notnull)"
                )
        self._out_dir = out_dir
        self._columns = columns
        self._predicate = preds or None
        self._rows_per_block = rows_per_block
        self._split_bytes = split_bytes
        entries = manifest.load_manifest(out_dir)
        if not entries:
            raise FileNotFoundError(f"no manifest entries under {out_dir}")
        if preds:
            # AND semantics: a stripe survives only if EVERY conjunct
            # may match its stats
            entries = [
                e for e in entries if all(_stats_may_match(e, p) for p in preds)
            ]
        self._entries = sorted(entries, key=lambda e: e["path"])
        self._schema = stripes_schema(out_dir)

    def estimate_inmemory_data_size(self) -> int | None:
        return sum(e.get("raw_bytes", 0) for e in self._entries) or None

    def get_name(self) -> str:
        return "Stripes"

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        import pyarrow as pa

        from ..stages.decode import make_stripe_decoder

        decoder = make_stripe_decoder(
            self._columns,
            predicate=self._predicate,
            unified_schema=self._schema,
            rows_per_block=self._rows_per_block,
        )
        out_schema = (
            pa.schema([self._schema.field(c) for c in self._columns])
            if self._columns is not None
            else self._schema
        )
        tasks = []
        for e in self._entries:
            path = e["path"]
            raw = e.get("raw_bytes") or 0
            n_chunks = 1
            if raw > self._split_bytes:
                # oversized stripe (external compaction etc.): split the
                # decode across its row chunks — one driver-side tail read
                # of the footer, then one ReadTask per chunk group, each
                # ranged-reading only its chunks' streams (reference
                # byte-range splitting parity, src/physical_exec.rs:79-82)
                from .. import stripe as stripe_mod

                n_chunks = stripe_mod.n_chunks_of(stripe_mod.read_footer_from_file(path))
            if n_chunks > 1:
                n_tasks = max(1, -(-raw // self._split_bytes))
                size = max(1, n_chunks // n_tasks)
                groups = [
                    (lo, min(lo + size, n_chunks)) for lo in range(0, n_chunks, size)
                ]
            else:
                groups = [None]
            for grp in groups:
                if grp is None:

                    def read_fn(path=path):
                        return decoder(pa.table({"path": [path]}))

                else:

                    def read_fn(path=path, grp=grp):
                        return decoder(
                            pa.table(
                                {
                                    "path": [path],
                                    "chunk_lo": [grp[0]],
                                    "chunk_hi": [grp[1]],
                                }
                            )
                        )

                frac = 1.0 if grp is None else (grp[1] - grp[0]) / n_chunks
                # with a residual predicate the true output rows are unknown
                # until decode; report size as an estimate only
                meta = BlockMetadata(
                    num_rows=None
                    if (self._predicate is not None or grp is not None)
                    else e.get("n_rows"),
                    size_bytes=int(raw * frac) if raw else e.get("raw_bytes"),
                    exec_stats=None,
                    input_files=[path],
                )
                tasks.append(ReadTask(read_fn, meta, schema=out_schema))
        if not tasks:
            # empty (fully pruned) scan: one no-op task keeps the schema
            empty = pa.Table.from_pylist([], schema=out_schema)
            tasks.append(
                ReadTask(
                    lambda empty=empty: [empty],
                    BlockMetadata(num_rows=0, size_bytes=0, exec_stats=None, input_files=[]),
                    schema=out_schema,
                )
            )
        return tasks
