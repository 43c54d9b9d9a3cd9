"""Decode stage: manifest rows in, original Arrow batches out.

Mirrors the reference scan hot path (SURVEY.md §3.3 OrcOpener::open):
each task opens its stripe blob, reads the footer, decodes only the
projected columns (ProjectionMask semantics, src/physical_exec.rs:68-78)
and yields a RecordBatch stream. Decoding is stateless (all decode state
— FSST tables, dictionaries — travels inside the blob), so this is a
plain-function stage: cheap elastic tasks, no actor pool needed.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pyarrow as pa

from .. import stripe


def make_stripe_decoder(
    columns: list[str] | None = None,
) -> Callable[[pa.Table], Iterator[pa.Table]]:
    """Returns a map_batches fn. Input batches carry a ``path`` column
    (manifest rows); yields one decoded table per stripe so memory stays
    at one-stripe granularity."""

    def decode_stripes(batch: pa.Table) -> Iterator[pa.Table]:
        for path in batch.column("path").to_pylist():
            if columns is not None:
                # projected: ranged reads of just the selected streams
                yield stripe.decode_file(path, columns=columns)
            else:
                with open(path, "rb") as f:
                    blob = f.read()
                yield stripe.decode_table(blob)

    return decode_stripes
