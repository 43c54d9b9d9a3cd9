"""Deduplication pipelines for training-data curation at scale:

* exact         — content-hash partition + min-id per group
* MinHash + LSH — shingle -> minhash -> band -> bucket groupby -> verify
* SimHash       — 64-bit near-dup signature per doc
* n-gram Jaccard verification of candidate pairs
* embedding cosine near-dup (see similarity.py for the kNN machinery)

Scale notes (the partitioning assumptions each op relies on):
- exact dedup shuffles only (hash, doc_id) pairs, never the text;
- LSH shuffles (band_id, band_hash, doc_id) triples — constant per doc;
- pair verification broadcasts the candidate docs' shingle sets
  (candidates are a tiny fraction of the corpus); at 100 TB this
  becomes a bucketed self-join on doc_id, same semantics.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .relational import collect

# ------------------------------------------------------------------ exact

def _sha1_hex(values: list[str | None]) -> list[str | None]:
    return [None if v is None else hashlib.sha1(v.encode()).hexdigest() for v in values]


def exact_dedup_ids(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """One surviving id per distinct text: min(id) per content hash.
    Pre-aggregates (hash -> min id) per batch so the shuffle moves one
    row per distinct hash per batch."""

    def hash_and_partial(batch: pa.Table) -> pa.Table:
        h = _sha1_hex(batch.column(text_col).to_pylist())
        tbl = pa.table({"__h": pa.array(h, pa.string()), id_col: batch.column(id_col)})
        return pa.TableGroupBy(tbl, ["__h"]).aggregate([(id_col, "min")])

    partials = ds.map_batches(hash_and_partial, batch_format="pyarrow")
    from ray.data.aggregate import Min

    final = partials.groupby("__h").aggregate(Min(f"{id_col}_min", alias_name=id_col))
    return final.drop_columns(["__h"])


# ------------------------------------------------------------- minhash/LSH

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Actor-pool stage: doc -> k minhashes over word shingles, emitted as
    (band_id, band_hash, doc_id) rows for the LSH bucket groupby.
    Hash-function parameters are built once per actor in __init__."""

    def __init__(self, k: int = 64, bands: int = 16, shingle: int = 3, seed: int = 42) -> None:
        rng = np.random.default_rng(seed)
        self.k, self.bands, self.rows = k, bands, k // bands
        self.shingle = shingle
        self.a = rng.integers(1, _MERSENNE, k, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, k, dtype=np.uint64)

    def shingle_hashes(self, text: str) -> np.ndarray:
        toks = text.split()
        if len(toks) < self.shingle:
            toks = toks + [""] * (self.shingle - len(toks))
        th = np.array(
            [hash_token(t) for t in toks], dtype=np.uint64
        )
        n = len(toks) - self.shingle + 1
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(self.shingle):
            acc = acc * np.uint64(1099511628211) + th[j : j + n]
        return np.unique(acc)

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingle_hashes(text)
        if sh.size == 0:
            return np.zeros(self.k, dtype=np.uint64)
        # (a*x+b) mod p, min over shingles, vectorized k x n
        v = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if not text:
                continue
            sig = self.signature(text)
            for b in range(self.bands):
                band = sig[b * self.rows : (b + 1) * self.rows]
                h = hashlib.sha1(band.tobytes()).hexdigest()[:16]
                doc_ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
            }
        )


def hash_token(t: str) -> int:
    import zlib

    return zlib.crc32(t.encode()) or 1


def minhash_candidate_pairs(
    ds: ray.data.Dataset, concurrency: int = 2, bands: int = 16, k: int = 64
) -> pa.Table:
    """LSH: same (band_id, band_hash) bucket -> candidate pair. The only
    shuffle is the bucket groupby over constant-size triples."""
    triples = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"k": k, "bands": bands},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_id_a": [], "doc_id_b": []})
        a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
        return pd.DataFrame({"doc_id_a": list(a), "doc_id_b": list(b)})

    pairs = triples.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    out = collect(pairs)
    if out.num_rows == 0:
        return pa.table({"doc_id_a": pa.array([], pa.int64()), "doc_id_b": pa.array([], pa.int64())})
    out = out.group_by(["doc_id_a", "doc_id_b"]).aggregate([]).sort_by(
        [("doc_id_a", "ascending"), ("doc_id_b", "ascending")]
    )
    return pa.table(
        {
            "doc_id_a": pc.cast(out.column("doc_id_a"), pa.int64()),
            "doc_id_b": pc.cast(out.column("doc_id_b"), pa.int64()),
        }
    )


def verify_pairs_jaccard(
    ds: ray.data.Dataset, pairs: pa.Table, threshold: float = 0.8, shingle: int = 3
) -> pa.Table:
    """n-gram Jaccard verification of candidate pairs. The candidate doc
    set is broadcast (ray.put) — candidates are tiny vs the corpus; at
    larger candidate volumes swap for a doc_id-bucketed join."""
    cand = set(pairs.column("doc_id_a").to_pylist()) | set(pairs.column("doc_id_b").to_pylist())
    if not cand:
        return pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    cand_ref = ray.put(cand)
    mh = MinHasher(shingle=shingle)

    def collect_shingles(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        rows = [
            (d, mh.shingle_hashes(t).tobytes())
            for d, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist())
            if d in wanted and t
        ]
        return pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "shingles": pa.array([r[1] for r in rows], pa.binary()),
            }
        )

    sh_tbl = collect(ds.map_batches(collect_shingles, batch_format="pyarrow"))
    sh = {
        d: np.frombuffer(s, dtype=np.uint64)
        for d, s in zip(sh_tbl.column("doc_id").to_pylist(), sh_tbl.column("shingles").to_pylist())
    }
    out_a, out_b, out_j = [], [], []
    for a, b in zip(pairs.column("doc_id_a").to_pylist(), pairs.column("doc_id_b").to_pylist()):
        sa, sb = sh.get(a), sh.get(b)
        if sa is None or sb is None:
            continue
        inter = np.intersect1d(sa, sb).size
        union = sa.size + sb.size - inter
        j = inter / union if union else 0.0
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(j)
    return pa.table(
        {
            "doc_id_a": pa.array(out_a, pa.int64()),
            "doc_id_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


# --------------------------------------------------------------- simhash

class SimHasher:
    """64-bit SimHash over word-level features (actor pool)."""

    def __init__(self) -> None:
        pass

    @staticmethod
    def simhash64(text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hs = np.array(
            [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little") for t in toks],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        vote = (2 * bits - 1).sum(axis=0)
        return int((np.uint64(1) << np.arange(64, dtype=np.uint64))[vote > 0].sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            None if t is None else np.uint64(self.simhash64(t)).astype(np.int64).item()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table({"doc_id": batch.column("doc_id"), "simhash": pa.array(sigs, pa.int64())})


def simhashes(ds: ray.data.Dataset, concurrency: int = 2) -> ray.data.Dataset:
    return ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=concurrency)
