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


def existing_entry(out_dir: str, stripe_id: str) -> dict | None:
    """The manifest entry for ``stripe_id`` if that stripe is already
    durable, else None — lets deterministic-id encoders skip the whole
    encode on resume instead of re-compressing just to have
    write_stripe discard the result."""
    _, man_path = stripe_paths(out_dir, stripe_id)
    try:
        return json.loads(dio.read_bytes(man_path))
    except (FileNotFoundError, OSError):
        return None


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


COMPACT_PREFIX = "cmp-"


def _replaced_ids(out_dir: str, names: list[str]) -> set[str]:
    """Stripe ids superseded by compacted stripes: each ``cmp-*``
    manifest lists the member ids it replaces. Reading only those
    manifests keeps the common path names-only."""
    mdir = dio.join(out_dir, MANIFEST_DIR)
    replaced: set[str] = set()
    for f in names:
        if f.startswith(COMPACT_PREFIX) and f.endswith(".json"):
            entry = json.loads(dio.read_bytes(dio.join(mdir, f)))
            replaced.update(entry.get("replaces", []))
    return replaced


def completed_ids(out_dir: str) -> set[str]:
    """Ids that need no re-encode: present manifests PLUS ids replaced by
    compaction (their files may be gone, but the data lives on in the
    merged stripes — resume must not redo those fragments)."""
    names = [
        f for f in dio.list_dir(dio.join(out_dir, MANIFEST_DIR)) if f.endswith(".json")
    ]
    ids = {f[: -len(".json")] for f in names}
    return ids | _replaced_ids(out_dir, names)


def load_manifest(out_dir: str) -> list[dict]:
    """Current manifest entries. Entries whose id is listed in a
    compacted stripe's ``replaces`` are EXCLUDED even if their files
    still exist — the compaction commit point is the merged manifest
    write, so a crash between that write and member cleanup never
    surfaces duplicate rows."""
    mdir = dio.join(out_dir, MANIFEST_DIR)
    names = [f for f in dio.list_dir(mdir) if f.endswith(".json")]
    replaced = _replaced_ids(out_dir, names)
    entries = []
    for f in names:
        if f[: -len(".json")] in replaced:
            continue
        entries.append(json.loads(dio.read_bytes(dio.join(mdir, f))))
    return entries
