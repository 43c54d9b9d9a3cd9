"""Per-partition lineage manifests = the checkpoint (SURVEY.md §4 rows
"Retries" and "Checkpoint / resume").

Each encoded stripe gets one small JSON manifest file written
atomically (temp name + rename) AFTER its blob is durable, so:
  * a failed run never leaves a manifest row for a half-written stripe;
  * restart lists ``manifest/``, skips completed partition ids, and
    re-runs only the missing ones;
  * stripe writes are idempotent (content-/fragment-addressed names).

The reference has no checkpointing (read-only engine, SURVEY.md §4);
this is the north-rule addition "resumable from checkpointed manifests".
"""

from __future__ import annotations

import json
import os
import uuid

MANIFEST_DIR = "manifest"
STRIPE_DIR = "stripes"


def stripe_paths(out_dir: str, stripe_id: str) -> tuple[str, str]:
    return (
        os.path.join(out_dir, STRIPE_DIR, f"{stripe_id}.rstp"),
        os.path.join(out_dir, MANIFEST_DIR, f"{stripe_id}.json"),
    )


def ensure_dirs(out_dir: str) -> None:
    os.makedirs(os.path.join(out_dir, STRIPE_DIR), exist_ok=True)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)


def _atomic_write(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def write_stripe(out_dir: str, stripe_id: str, blob: bytes, entry: dict) -> dict:
    """Durably write blob then manifest row; returns the manifest entry.

    Idempotent: an existing manifest row for ``stripe_id`` short-circuits
    (the stripe was already completed by a previous attempt/run)."""
    ensure_dirs(out_dir)
    blob_path, man_path = stripe_paths(out_dir, stripe_id)
    if os.path.exists(man_path):
        with open(man_path, "rb") as f:
            return json.loads(f.read())
    _atomic_write(blob_path, blob)
    entry = {
        "stripe_id": stripe_id,
        "path": blob_path,
        "encoded_bytes": len(blob),
        **entry,
    }
    _atomic_write(man_path, json.dumps(entry, separators=(",", ":")).encode())
    return entry


def completed_ids(out_dir: str) -> set[str]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    return {f[: -len(".json")] for f in os.listdir(mdir) if f.endswith(".json")}


def load_manifest(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    entries = []
    if not os.path.isdir(mdir):
        return entries
    for f in sorted(os.listdir(mdir)):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f), "rb") as fh:
                entries.append(json.loads(fh.read()))
    return entries
