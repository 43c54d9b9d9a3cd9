"""Distributed k-means over an embedding column (Lloyd's algorithm),
Ray-Data-first: every iteration is ONE streaming pass — per-batch
nearest-centroid assignment (float64 matmul) emitting at most k
per-cluster moment rows (count + coordinate sums packed as a binary
blob), merged through the same size-gated tree reduce the relational
aggregates use. Centroids are broadcast state (``ray.put`` once per
iteration); the corpus never shuffles and the driver only ever holds
k x dim floats.

The reference engine has no clustering (it is a scan shim,
src/lib.rs:107-169); this is a north-rule addition — cluster structure
is what SemDeDup-style curation and IVF ANN partitioning consume.
Deterministic end-to-end: init picks the k vectors with the SMALLEST id
(no RNG), ties in assignment break to the lowest cluster index, so the
same input yields the same model at any partitioning or parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .relational import _tree_or_driver, collect
from .similarity import _batch_matrix


def _first_k_by_id(ds: ray.data.Dataset, k: int, id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic init: embeddings of the k smallest ids. Per-batch
    head-k after a local sort (combiner) -> tree reduce; the driver sees
    at most fanin x k rows."""

    def head(batch: pa.Table) -> pa.Table:
        if id_col not in batch.column_names:
            # an empty dataset collects to a schemaless table; pass it
            # through so the empty-input check below can report clearly
            return batch
        batch = batch.select([id_col, vec_col])
        order = pc.select_k_unstable(batch, k, [(id_col, "ascending")])
        return batch.take(order)

    t = _tree_or_driver(ds.map_batches(head, batch_format="pyarrow"), head, fanin=8)
    if t.num_rows == 0 or vec_col not in t.column_names:
        # an empty dataset collects to a schemaless table — surface a
        # clear empty-input signal instead of a KeyError deep in init
        return np.zeros((0, 0), np.float64)
    t = t.take(pc.select_k_unstable(t, k, [(id_col, "ascending")]))
    return _batch_matrix(t, vec_col)


def _maximin_init(
    ds: ray.data.Dataset, k: int, id_col: str, vec_col: str, sample: int = 2048
) -> np.ndarray:
    """Deterministic farthest-point (maximin) init on a head-by-id
    sample: start from the smallest-id vector, then repeatedly add the
    sample point farthest from its nearest chosen centroid (ties ->
    lowest index). No RNG, robust to the split-blob local optimum that
    naive first-k init falls into; the sample is driver-sized and
    id-ordered, so the same corpus gives the same init at any scale."""
    m = _first_k_by_id(ds, max(k, sample), id_col, vec_col)
    if len(m) == 0:
        raise ValueError("cannot fit k-means on an empty dataset")
    chosen = [0]
    d = np.linalg.norm(m - m[0], axis=1)
    for _ in range(1, min(k, len(m))):
        nxt = int(d.argmax())
        chosen.append(nxt)
        d = np.minimum(d, np.linalg.norm(m - m[nxt], axis=1))
    return m[chosen].copy()


def _assign(m: np.ndarray, cent: np.ndarray, ndigits: int | None = None):
    """Nearest centroid by Euclidean distance; ties -> lowest index
    (argmin's first-hit). ``ndigits`` rounds the distance (half away
    from zero) BEFORE the argmin so a double-precision SQL oracle
    computing list_distance agrees bit-for-bit on the winner."""
    d2 = (
        np.sum(m * m, axis=1, keepdims=True)
        - 2.0 * (m @ cent.T)
        + np.sum(cent * cent, axis=1)
    )
    np.maximum(d2, 0.0, out=d2)
    if ndigits is None:
        return d2.argmin(axis=1), d2
    d = np.sqrt(d2)
    rd = np.floor(d * 10.0**ndigits + 0.5) / 10.0**ndigits  # half away from zero
    return rd.argmin(axis=1), rd


def kmeans_fit(
    ds: ray.data.Dataset,
    k: int,
    n_iter: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tol: float = 1e-6,
) -> dict:
    """Lloyd's k-means. Returns {"centroids": (k, dim) float64,
    "inertia": [per-iteration sum of squared distances], "n_iter": int}.

    Scale shape: the input is materialized ONCE (projected to id+vec)
    so iterations re-read object-store blocks, not remote parquet; each
    iteration's exchange carries <= k rows per batch (count + packed
    coordinate sums), independent of corpus size. Empty clusters keep
    their previous centroid (standard Lloyd choice, keeps k stable)."""
    proj = ds.select_columns([id_col, vec_col]).materialize()
    cent = _maximin_init(proj, k, id_col, vec_col)
    dim = cent.shape[1]
    inertia: list[float] = []

    def _empty_partial() -> pa.Table:
        return pa.table(
            {
                "cluster": pa.array([], pa.int32()),
                "n": pa.array([], pa.int64()),
                "sse": pa.array([], pa.float64()),
                "vsum": pa.array([], pa.binary()),
            }
        )

    def combine(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _empty_partial()
        cl = tbl.column("cluster").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        sse = tbl.column("sse").to_numpy(zero_copy_only=False)
        sums = np.stack(
            [np.frombuffer(b.as_py(), np.float64) for b in tbl.column("vsum")]
        )
        uniq = np.unique(cl)
        out_n = np.zeros(len(uniq), np.int64)
        out_sse = np.zeros(len(uniq), np.float64)
        out_sum = np.zeros((len(uniq), sums.shape[1]), np.float64)
        pos = np.searchsorted(uniq, cl)
        np.add.at(out_n, pos, n)
        np.add.at(out_sse, pos, sse)
        np.add.at(out_sum, pos, sums)
        return pa.table(
            {
                "cluster": pa.array(uniq.astype(np.int32)),
                "n": pa.array(out_n),
                "sse": pa.array(out_sse),
                "vsum": pa.array([row.tobytes() for row in out_sum], pa.binary()),
            }
        )

    for it in range(n_iter):
        cent_ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_partial()
            c = ray.get(cent_ref)
            m = _batch_matrix(batch, vec_col)
            a, d2 = _assign(m, c)
            uniq = np.unique(a)
            nrows = np.zeros(len(uniq), np.int64)
            sse = np.zeros(len(uniq), np.float64)
            vsum = np.zeros((len(uniq), m.shape[1]), np.float64)
            pos = np.searchsorted(uniq, a)
            np.add.at(nrows, pos, 1)
            np.add.at(sse, pos, d2[np.arange(len(a)), a])
            np.add.at(vsum, pos, m)
            return pa.table(
                {
                    "cluster": pa.array(uniq.astype(np.int32)),
                    "n": pa.array(nrows),
                    "sse": pa.array(sse),
                    "vsum": pa.array([row.tobytes() for row in vsum], pa.binary()),
                }
            )

        merged = _tree_or_driver(
            proj.map_batches(partial, batch_format="pyarrow"), combine, fanin=8
        )
        cl = merged.column("cluster").to_numpy(zero_copy_only=False)
        n = merged.column("n").to_numpy(zero_copy_only=False)
        sums = np.stack(
            [np.frombuffer(b.as_py(), np.float64) for b in merged.column("vsum")]
        )
        new_cent = cent.copy()
        new_cent[cl] = sums / n[:, None]
        inertia.append(float(merged.column("sse").to_numpy(zero_copy_only=False).sum()))
        shift = float(np.abs(new_cent - cent).max())
        cent = new_cent
        if shift < tol:
            break
    return {"centroids": cent, "inertia": inertia, "n_iter": len(inertia), "dim": dim}


def kmeans_assign(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ndigits: int | None = 4,
) -> ray.data.Dataset:
    """Label every row with its nearest centroid: centroids broadcast
    once, one matmul per batch, zero shuffle. ``ndigits`` (default 4)
    rounds distances before the argmin — determinism across runtimes
    (and the SQL-oracle contract of nearest-centroid queries)."""
    cent_ref = ray.put(np.asarray(centroids, np.float64))

    def label(batch: pa.Table) -> pa.Table:
        out = batch.select([id_col])
        if batch.num_rows == 0:
            out = out.append_column("cluster", pa.array([], pa.int64()))
            return out.append_column("dist", pa.array([], pa.float64()))
        c = ray.get(cent_ref)
        m = _batch_matrix(batch, vec_col)
        a, rd = _assign(m, c, ndigits=ndigits)
        out = out.append_column("cluster", pa.array(a.astype(np.int64)))
        return out.append_column(
            "dist", pa.array(rd[np.arange(len(a)), a].astype(np.float64))
        )

    return ds.map_batches(label, batch_format="pyarrow")


def cluster_sizes(assigned: ray.data.Dataset) -> pa.Table:
    """Per-cluster row counts over an assignment (one grouped count
    through the size-gated reduce)."""
    from .relational import grouped_agg

    return grouped_agg(assigned, ["cluster"], {"n": ("count", "cluster")}).sort_by(
        [("cluster", "ascending")]
    )
