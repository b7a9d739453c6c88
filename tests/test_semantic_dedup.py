"""SemDeDup-style semantic dedup vs an in-test numpy reference
(same deterministic centroids → same cells → brute-force per-cell
cosine pairs → union-find min-label keepers)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from centrality_gpu_ray.functions.clustering import (kmeans_fit,
                                                     semantic_dedup)


def _blob_data(seed=3, n_per=40, d=32, n_dup=12, noise=0.6, pert=0.01):
    """3 well-separated blobs + planted near-duplicate companions
    (ids shifted by 10_000) whose cosine to their source is ~1."""
    rng = np.random.default_rng(seed)
    centers = np.zeros((3, d))
    centers[0, 0] = centers[1, 1] = centers[2, 2] = 1.0
    rows, ids = [], []
    vid = 0
    for b in range(3):
        X = centers[b][None, :] + noise * rng.standard_normal((n_per, d))
        for x in X:
            rows.append(x)
            ids.append(vid)
            vid += 1
    rows = np.asarray(rows)
    src = rng.choice(vid, size=n_dup, replace=False)
    dup_rows = rows[src] + pert * rng.standard_normal((n_dup, rows.shape[1]))
    allX = np.vstack([rows, dup_rows])
    all_ids = np.array(ids + [int(s) + 10_000 for s in src])
    return all_ids, allX, src


def _emb_ds(ids, X, nparts=1):
    import ray.data

    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [row.astype(np.float32)
                                     for row in X]})
    ds = ray.data.from_pandas(df)
    return ds.repartition(nparts) if nparts > 1 else ds


def _reference(ids, X, centroids, threshold, cap=None):
    """Brute-force per-cell pairs + union-find min-label keepers."""
    C = np.asarray(centroids)
    Xf = X.astype(np.float32).astype(np.float64)  # match engine f32 load
    d2 = (np.einsum("ij,ij->i", Xf, Xf)[:, None]
          - 2.0 * Xf @ C.T + np.einsum("ij,ij->i", C, C)[None, :])
    cells = np.argmin(d2, axis=1)
    Xn = Xf / np.maximum(np.linalg.norm(Xf, axis=1, keepdims=True), 1e-12)
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in np.unique(cells):
        sel = np.flatnonzero(cells == c)
        sel = sel[np.argsort(ids[sel])]
        if cap is not None and sel.size > cap:
            sel = sel[:cap]
        sims = Xn[sel] @ Xn[sel].T
        for i in range(sel.size):
            for j in range(i + 1, sel.size):
                if sims[i, j] >= threshold:
                    a, b = find(int(ids[sel[i]])), find(int(ids[sel[j]]))
                    if a != b:
                        parent[max(a, b)] = min(a, b)
    lab = {i: find(i) for i in parent}
    return {i: (lab[i], lab[i] == i) for i in parent}


def _run(ds, ids, X, threshold=0.95, k=3, cap=None, **kw):
    fit = kmeans_fit(ds, k, vec_col="embedding", id_col="vec_id")
    got = semantic_dedup(ds, k=k, threshold=threshold,
                         centroids=fit["centroids"],
                         **({"cluster_cap": cap} if cap else {}),
                         **kw).to_pandas().sort_values("vec_id") \
        .reset_index(drop=True)
    want = _reference(ids, X, fit["centroids"], threshold, cap=cap)
    assert len(got) == len(want)
    for _, row in got.iterrows():
        wl, wk = want[int(row["vec_id"])]
        assert int(row["cluster"]) == wl, row
        assert bool(row["keep"]) == wk, row
    return got


def test_semantic_dedup_planted_blobs():
    ids, X, src = _blob_data()
    got = _run(_emb_ds(ids, X), ids, X)
    by_id = got.set_index("vec_id")
    # every planted companion dies and clusters with its source
    for s in src:
        assert not by_id.loc[int(s) + 10_000, "keep"]
        assert (by_id.loc[int(s) + 10_000, "cluster"]
                == by_id.loc[int(s), "cluster"])
    # keeper arithmetic: exactly the planted companions die (blob
    # noise 0.6 keeps natural cosines far below 0.95)
    assert int(got["keep"].sum()) == len(ids) - len(src)


def test_semantic_dedup_partitioning_invariance():
    ids, X, _ = _blob_data(seed=11)
    one = _run(_emb_ds(ids, X), ids, X)
    many = semantic_dedup(_emb_ds(ids, X, nparts=5), k=3, threshold=0.95,
                          centroids=kmeans_fit(
                              _emb_ds(ids, X), 3, vec_col="embedding",
                              id_col="vec_id")["centroids"]) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)


def test_semantic_dedup_no_dups_trivial():
    rng = np.random.default_rng(5)
    ids = np.arange(30)
    X = rng.standard_normal((30, 16)) * 3.0
    got = _run(_emb_ds(ids, X), ids, X, threshold=0.999, k=2)
    assert got["keep"].all()
    assert (got["cluster"].to_numpy() == got["vec_id"].to_numpy()).all()


def test_semantic_dedup_cell_cap_logged_truncation():
    # one tight blob bigger than the cap: pairs only among the cap
    # smallest ids — engine must match the reference under the SAME
    # truncation rule
    rng = np.random.default_rng(9)
    n, d = 24, 8
    ids = np.arange(n)
    X = np.ones((n, d)) + 0.001 * rng.standard_normal((n, d))
    got = _run(_emb_ds(ids, X), ids, X, threshold=0.99, k=1, cap=10)
    # ids beyond the cap were never compared: they all survive
    assert got[got["vec_id"] >= 10]["keep"].all()
    assert not got[(got["vec_id"] > 0) & (got["vec_id"] < 10)]["keep"].any()
