"""Similarity search over an embedding column (list<float>).

* brute-force cosine top-k — the exact baseline: broadcast the query
  matrix once (ray.put), numpy matmul per batch, per-batch top-k
  combiner, tiny final merge. No shuffle.
* IVF variant — the scale path: k-means-lite centroids from a sample,
  assign rows to cells in one pass, probe only the closest cells.
* embedding-cosine near-duplicate pairs via the same machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..util import default_concurrency
from .relational import collect


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0]) if len(arr) else 0
    return flat.reshape(len(arr), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_cosine(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact top-k by cosine similarity. Returns (id, cos_sim) sorted desc."""
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def batch_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = m @ qv
        idx = np.argsort(-sims)[:k]
        return pa.table(
            {
                id_col: batch.column(id_col).take(pa.array(idx, pa.int64())),
                "cos_sim": pa.array(sims[idx], pa.float64()),
            }
        )

    parts = collect(ds.map_batches(batch_topk, batch_format="pyarrow"))
    order = np.argsort(-parts.column("cos_sim").to_numpy())[:k]
    return parts.take(pa.array(order, pa.int64()))


class IVFIndexStage:
    """Assign rows to inverted-file cells (actor pool; centroids broadcast
    once per actor). Emits (cell, id, vec) for cell-pruned search."""

    def __init__(self, centroids_ref) -> None:
        self.centroids = _normalize(ray.get(centroids_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, "embedding"))
        cells = (m @ self.centroids.T).argmax(axis=1)
        return batch.append_column("__cell", pa.array(cells.astype(np.int32)))


def build_centroids(ds: ray.data.Dataset, n_cells: int, sample: int = 2048, iters: int = 5) -> np.ndarray:
    """k-means-lite on a driver-side sample (centroids are broadcast
    state, sample stays small regardless of corpus size)."""
    total = ds.count()
    s = ds if total <= sample else ds.random_sample(sample / total, seed=42)
    m = _normalize(_batch_matrix(collect(s.select_columns(["embedding"])), "embedding"))
    rng = np.random.default_rng(42)
    cent = m[rng.choice(m.shape[0], min(n_cells, m.shape[0]), replace=False)]
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            members = m[assign == c]
            if members.size:
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_cosine_ivf(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate top-k: search only the n_probe cells closest to the
    query. At scale the cell assignment is computed once at ingest and
    stored, making each query touch ~n_probe/n_cells of the data."""
    cent = build_centroids(ds, n_cells)
    cent_ref = ray.put(cent)
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe_cells = set(np.argsort(-(cent @ q))[:n_probe].tolist())
    assigned = ds.map_batches(
        IVFIndexStage, fn_constructor_kwargs={"centroids_ref": cent_ref},
        batch_format="pyarrow", concurrency=default_concurrency(),
    )
    cells_arr = pa.array(sorted(probe_cells), pa.int32())

    def cell_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("__cell"), value_set=cells_arr))

    probed = assigned.map_batches(cell_filter, batch_format="pyarrow")
    return knn_cosine(probed, q, k=k, id_col=id_col)


def embedding_near_dup_pairs(
    ds: ray.data.Dataset, threshold: float = 0.95, id_col: str = "vec_id"
) -> pa.Table:
    """All pairs above cosine threshold. Per-batch gram matrix against a
    broadcast full matrix (fine to ~1M rows x small dim; beyond that,
    LSH-bucket by random hyperplanes first)."""
    full = collect(ds.select_columns([id_col, "embedding"]))
    ids = full.column(id_col).to_numpy()
    m = _normalize(_batch_matrix(full, "embedding"))
    m_ref = ray.put((ids, m))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(m_ref)
        bm = _normalize(_batch_matrix(batch, "embedding"))
        bids = batch.column(id_col).to_numpy()
        sims = bm @ all_m.T
        ai, bi = np.nonzero(sims >= threshold)
        keep = bids[ai] < all_ids[bi]  # upper triangle only, no self-pairs
        return pa.table(
            {
                "id_a": pa.array(bids[ai][keep], pa.int64()),
                "id_b": pa.array(all_ids[bi][keep], pa.int64()),
                "cos_sim": pa.array(sims[ai, bi][keep], pa.float64()),
            }
        )

    out = collect(ds.map_batches(batch_pairs, batch_format="pyarrow"))
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
