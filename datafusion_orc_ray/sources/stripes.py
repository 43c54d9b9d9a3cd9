"""read_stripes: our table-of-stripes equivalent of the reference's
``read_orc`` DataFrame API (SURVEY.md S10, src/lib.rs:122-156).

A stripe directory (blobs + manifests) becomes a ``ray.data.Dataset``:
the manifest list is the file listing, one decode task per stripe, with
column pruning pushed into the decoder (S5). Schema comes from the
manifests' serialized Arrow schema — deterministic merge across stripes
sorted by path, mirroring infer_schema's sort-for-determinism
(src/file_format.rs:90-103).
"""

from __future__ import annotations

import ray.data

from ..stages.decode import make_stripe_decoder
from ..state import manifest


def read_stripes(
    out_dir: str,
    columns: list[str] | None = None,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    entries = manifest.load_manifest(out_dir)
    if not entries:
        raise FileNotFoundError(f"no manifest entries under {out_dir}")
    items = [{"path": e["path"]} for e in sorted(entries, key=lambda e: e["path"])]
    ds = ray.data.from_items(items)
    return ds.map_batches(
        make_stripe_decoder(columns),
        batch_format="pyarrow",
        batch_size=1,  # one decode task per stripe; stripes are already coarse
        concurrency=concurrency,
    )
