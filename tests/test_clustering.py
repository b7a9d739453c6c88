"""Distributed Lloyd k-means vs an independent serial numpy oracle."""

import numpy as np
import pyarrow as pa
import ray.data

from centrality_gpu_ray.functions.clustering import (
    kmeans, kmeans_assign, kmeans_fit)

SF = "/root/testdata/sf0.01"


def _serial_lloyd(X, C0, iters, tol=1e-6):
    C = C0.copy()
    history, prev = [], np.inf
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        inertia = float(d2[np.arange(len(X)), a].sum())
        history.append(inertia)
        for j in range(C.shape[0]):
            if np.any(a == j):
                C[j] = X[a == j].mean(axis=0)
        if np.isfinite(prev) and prev - inertia <= tol * max(prev, 1.0):
            break
        prev = inertia
    # assignments against the FINAL (post-update) centroids, matching
    # kmeans_assign's semantics
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return C, np.argmin(d2, axis=1), history


def _emb():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _emb_matrix():
    import pyarrow.parquet as pq

    from centrality_gpu_ray.functions.similarity import _matrix_from_arrow
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    order = np.argsort(t.column("vec_id").to_numpy())
    return (_matrix_from_arrow(t.column("embedding"))[order],
            t.column("vec_id").to_numpy()[order])


def test_kmeans_matches_serial_oracle():
    X, ids = _emb_matrix()
    C0 = X[:8]  # deterministic init = smallest-id vectors
    fit = kmeans_fit(_emb(), k=8, iters=6)
    want_C, want_a, want_hist = _serial_lloyd(X, C0, 6)
    assert np.allclose(fit["centroids"], want_C, atol=1e-9)
    assert np.allclose(fit["inertia_history"], want_hist, rtol=1e-12)
    got = kmeans_assign(_emb(), fit["centroids"]).to_pandas() \
        .sort_values("vec_id")
    assert np.array_equal(got["cluster"].to_numpy(), want_a)


def test_kmeans_inertia_monotone_and_partition_invariant():
    fit = kmeans_fit(_emb(), k=5, iters=8)
    h = fit["inertia_history"]
    assert all(h[i + 1] <= h[i] + 1e-9 for i in range(len(h) - 1))
    fit2 = kmeans_fit(_emb().repartition(7), k=5, iters=8)
    assert np.allclose(fit["centroids"], fit2["centroids"], atol=1e-8)


def test_kmeans_separates_planted_clusters():
    rng = np.random.default_rng(3)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    lab = rng.integers(0, 3, 300)
    lab[:3] = [0, 1, 2]  # deterministic init seeds one centroid per cluster
    X = centers[lab] + rng.normal(scale=0.3, size=(300, 2))
    t = pa.table({"vec_id": pa.array(np.arange(300, dtype=np.int64)),
                  "embedding": pa.array(list(X),
                                        type=pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(t).repartition(4)
    asg, fit = kmeans(ds, k=3, iters=15)
    df = asg.to_pandas().sort_values("vec_id")
    # each planted cluster maps to exactly one learned cluster
    for j in range(3):
        vals = df["cluster"].to_numpy()[lab == j]
        assert len(np.unique(vals)) == 1
    assert fit["iters_run"] < 15  # converged early via tol
    assert df["dist"].max() < 3.0
