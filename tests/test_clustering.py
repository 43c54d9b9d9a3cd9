"""Distributed k-means (pipelines/clustering.py): planted-cluster
recovery, monotone inertia, partitioning invariance, empty-cluster
stability, deterministic assignment ties."""

import numpy as np
import pyarrow as pa
import ray.data

from datafusion_orc_ray.pipelines import clustering as cl
from datafusion_orc_ray.pipelines.relational import collect


def _planted(n_per=200, k=4, dim=8, spread=0.05, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim)) * 3.0
    pts = np.concatenate(
        [centers[i] + rng.normal(scale=spread, size=(n_per, dim)) for i in range(k)]
    )
    labels = np.repeat(np.arange(k), n_per)
    order = rng.permutation(len(pts))
    return pts[order].astype(np.float32), labels[order], centers


def _to_ds(pts: np.ndarray, nparts=4) -> ray.data.Dataset:
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(pts)), pa.int64()),
            "embedding": pa.array(list(pts), pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(tbl).repartition(nparts)


def test_kmeans_recovers_planted_clusters(ray_session):
    pts, labels, _ = _planted()
    ds = _to_ds(pts)
    model = cl.kmeans_fit(ds, k=4, n_iter=10)
    out = collect(cl.kmeans_assign(ds, model["centroids"])).sort_by("vec_id")
    got = np.array(out.column("cluster").to_pylist())
    # each planted cluster maps to exactly one learned cluster
    for lbl in range(4):
        mine = got[labels == lbl]
        assert len(set(mine.tolist())) == 1
    assert len(set(got.tolist())) == 4
    # inertia is monotone nonincreasing across Lloyd iterations
    inr = model["inertia"]
    assert all(b <= a + 1e-9 for a, b in zip(inr, inr[1:]))


def test_kmeans_partitioning_invariant(ray_session):
    pts, _, _ = _planted(n_per=100, k=3, seed=9)
    m1 = cl.kmeans_fit(_to_ds(pts, nparts=1), k=3, n_iter=6)
    m7 = cl.kmeans_fit(_to_ds(pts, nparts=7), k=3, n_iter=6)
    assert np.allclose(m1["centroids"], m7["centroids"], atol=1e-9)
    assert np.allclose(m1["inertia"], m7["inertia"], atol=1e-6)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    # k=3 over 2 tight blobs: one init centroid never wins a point but
    # the model must stay shape (3, dim) with finite values
    rng = np.random.default_rng(2)
    a = rng.normal(loc=0.0, scale=0.01, size=(50, 4))
    b = rng.normal(loc=10.0, scale=0.01, size=(50, 4))
    pts = np.concatenate([a, a[:1] + 0.001, b]).astype(np.float32)
    model = cl.kmeans_fit(_to_ds(pts, nparts=2), k=3, n_iter=5)
    assert model["centroids"].shape == (3, 4)
    assert np.isfinite(model["centroids"]).all()


def test_assign_tie_breaks_to_lowest_cluster(ray_session):
    pts = np.array([[0.0, 0.0]], dtype=np.float32)
    cent = np.array([[1.0, 0.0], [-1.0, 0.0]])  # equidistant
    out = collect(cl.kmeans_assign(_to_ds(pts, 1), cent))
    assert out.column("cluster").to_pylist() == [0]
    assert out.column("dist").to_pylist() == [1.0]


def test_cluster_sizes(ray_session):
    pts, labels, _ = _planted(n_per=50, k=2, seed=3)
    ds = _to_ds(pts, 3)
    model = cl.kmeans_fit(ds, k=2, n_iter=8)
    sizes = cl.cluster_sizes(cl.kmeans_assign(ds, model["centroids"]))
    assert sizes.column("n").to_pylist() == [50, 50]
