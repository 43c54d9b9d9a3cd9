"""Per-partition lineage manifests = the checkpoint (SURVEY.md §4 rows
"Retries" and "Checkpoint / resume").

Each encoded stripe gets one small JSON manifest file written
durably (temp name + move) AFTER its blob is durable, so:
  * a failed run never leaves a manifest row for a half-written stripe;
  * restart lists ``manifest/``, skips completed partition ids, and
    re-runs only the missing ones;
  * stripe writes are idempotent (content-/fragment-addressed names).

All IO goes through ``datafusion_orc_ray.io`` (pyarrow.fs), so an
out_dir may be a local path, file:// URI, or object-store URI — the
reference's object_store abstraction (src/object_store_reader.rs:39-59).
The reference itself has no checkpointing (read-only engine, SURVEY.md
§4); this is the north-rule addition "resumable from checkpointed
manifests".
"""

from __future__ import annotations

import json

from .. import io as dio

MANIFEST_DIR = "manifest"
STRIPE_DIR = "stripes"


def stripe_paths(out_dir: str, stripe_id: str) -> tuple[str, str]:
    return (
        dio.join(out_dir, STRIPE_DIR, f"{stripe_id}.rstp"),
        dio.join(out_dir, MANIFEST_DIR, f"{stripe_id}.json"),
    )


def ensure_dirs(out_dir: str) -> None:
    dio.makedirs(dio.join(out_dir, STRIPE_DIR))
    dio.makedirs(dio.join(out_dir, MANIFEST_DIR))


def write_stripe(out_dir: str, stripe_id: str, blob: bytes, entry: dict) -> dict:
    """Durably write blob then manifest row; returns the manifest entry.

    Idempotent: an existing manifest row for ``stripe_id`` short-circuits
    (the stripe was already completed by a previous attempt/run)."""
    ensure_dirs(out_dir)
    blob_path, man_path = stripe_paths(out_dir, stripe_id)
    try:
        return json.loads(dio.read_bytes(man_path))
    except (FileNotFoundError, OSError):
        pass
    dio.write_bytes_atomic(blob_path, blob)
    entry = {
        "stripe_id": stripe_id,
        "path": blob_path,
        "encoded_bytes": len(blob),
        **entry,
    }
    dio.write_bytes_atomic(man_path, json.dumps(entry, separators=(",", ":")).encode())
    return entry


def completed_ids(out_dir: str) -> set[str]:
    return {
        f[: -len(".json")]
        for f in dio.list_dir(dio.join(out_dir, MANIFEST_DIR))
        if f.endswith(".json")
    }


def load_manifest(out_dir: str) -> list[dict]:
    mdir = dio.join(out_dir, MANIFEST_DIR)
    entries = []
    for f in dio.list_dir(mdir):
        if f.endswith(".json"):
            entries.append(json.loads(dio.read_bytes(dio.join(mdir, f))))
    return entries
