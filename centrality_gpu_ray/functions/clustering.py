"""Distributed k-means over an embedding column — Lloyd iterations as
streaming map passes with sufficient-statistic merge.

Semantic clustering is core curation machinery (domain discovery,
cluster-balanced sampling, the coarse quantizer behind IVF ANN). The
100 TB shape: the centroid matrix is tiny and the data is huge, so
every Lloyd iteration is ONE streaming pass —

* broadcast the (k, d) centroid matrix via ``ray.put`` (one object,
  fetched once per node, not re-shipped per batch);
* each batch computes nearest centroids with one GEMM
  (``‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²``, argmin over the x·c matrix) and
  reduces to per-centroid sufficient statistics ``(sum_vec, count)``
  plus a partial inertia scalar — one row per block leaves the task;
* the driver sums P partials and recomputes centroids: O(k·d) driver
  state, independent of n. Empty clusters keep their previous
  centroid (same rule as ``similarity._kmeans_spherical``, the
  sample-trained IVF quantizer this generalizes).

Convergence is monitored by inertia delta; the final assignment pass
streams ``(id, cluster, dist)`` rows without materializing vectors.
Initialization is deterministic: the k vectors with the smallest ids
(partitioning-invariant, no RNG), or caller-provided centroids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from centrality_gpu_ray.functions.similarity import _matrix_from_arrow


def _nearest(X: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(assign, squared dist) via one GEMM; exact Euclidean."""
    x2 = np.einsum("ij,ij->i", X, X)
    c2 = np.einsum("ij,ij->i", C, C)
    d2 = x2[:, None] - 2.0 * (X @ C.T) + c2[None, :]
    a = np.argmin(d2, axis=1)
    best = np.maximum(d2[np.arange(X.shape[0]), a], 0.0)
    return a, best


def _init_centroids(emb_ds, k: int, vec_col: str, id_col: str) -> np.ndarray:
    """Deterministic seed: the k smallest-id vectors. Per-block local
    top-k then a driver merge of P·k candidate rows — no global sort."""
    def local_min(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(take))

    local_min.__name__ = "init_candidates"
    cand_blocks = emb_ds.select_columns([id_col, vec_col]).map_batches(
        local_min, batch_format="pyarrow")
    cand = pa.concat_tables(
        cand_blocks.iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="default")
    ids = cand.column(id_col).to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")[:k]
    M = _matrix_from_arrow(cand.column(vec_col))[order]
    if M.shape[0] < k:
        raise ValueError(f"k={k} exceeds dataset size {M.shape[0]}")
    return M


def kmeans_fit(emb_ds, k: int, iters: int = 10, tol: float = 1e-6,
               vec_col: str = "embedding", id_col: str = "vec_id",
               init: np.ndarray | None = None) -> dict:
    """Lloyd iterations; returns ``{"centroids", "inertia",
    "inertia_history", "iters_run"}``. One streaming pass per
    iteration, O(k·d) driver state."""
    C = (np.asarray(init, dtype=np.float64) if init is not None
         else _init_centroids(emb_ds, k, vec_col, id_col))
    d = C.shape[1]
    # every block ships a (k, d) float64 partial; keep the broadcast +
    # driver merge bounded (128 MiB per partial) — at larger k·d use a
    # hierarchical merge or minibatch variant instead
    if k * d > 16_777_216:
        raise ValueError(
            f"k*d = {k * d} exceeds the 2^24 partial-size cap; "
            f"per-block sufficient statistics would be "
            f"{k * d * 8 / 2**20:.0f} MiB")
    # pin the pruned column once — a lazy source would re-execute its
    # whole read/transform chain on EVERY Lloyd iteration
    vecs = emb_ds.select_columns([vec_col]).materialize()
    history = []
    prev = np.inf
    it = 0
    for it in range(1, iters + 1):
        ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            Cc = ray.get(ref)
            X = _matrix_from_arrow(batch.column(vec_col))
            a, dist2 = _nearest(X, Cc)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, a, X)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "sums": pa.array([sums.tobytes()], type=pa.binary()),
                "counts": pa.array([cnt.tobytes()], type=pa.binary()),
                "inertia": pa.array([float(dist2.sum())]),
            })

        partial.__name__ = f"kmeans_iter{it}"
        sums = np.zeros((k, d), dtype=np.float64)
        cnt = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for b in vecs.map_batches(partial, batch_format="pyarrow") \
                     .iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
            for s, c, i in zip(b.column("sums"), b.column("counts"),
                               b.column("inertia")):
                sums += np.frombuffer(s.as_py(),
                                      dtype=np.float64).reshape(k, d)
                cnt += np.frombuffer(c.as_py(), dtype=np.int64)
                inertia += i.as_py()
        history.append(inertia)
        nz = cnt > 0
        C = C.copy()
        C[nz] = sums[nz] / cnt[nz, None]  # empty clusters keep position
        # prev is inf on the first iteration — inf - x <= inf would
        # terminate immediately, so gate on finiteness
        if np.isfinite(prev) and prev - inertia <= tol * max(prev, 1.0):
            break
        prev = inertia
    return {"centroids": C, "inertia": history[-1],
            "inertia_history": history, "iters_run": it}


def kmeans_assign(emb_ds, centroids: np.ndarray,
                  vec_col: str = "embedding", id_col: str = "vec_id"):
    """Streaming assignment pass: ``(id, cluster, dist)`` rows."""
    C = np.asarray(centroids, dtype=np.float64)
    ref = ray.put(C)

    def fn(batch: pa.Table) -> pa.Table:
        Cc = ray.get(ref)
        X = _matrix_from_arrow(batch.column(vec_col))
        a, dist2 = _nearest(X, Cc)
        return pa.table({
            id_col: batch.column(id_col),
            "cluster": pa.array(a.astype(np.int64)),
            "dist": pa.array(np.sqrt(dist2)),
        })

    fn.__name__ = "kmeans_assign"
    return emb_ds.select_columns([id_col, vec_col]).map_batches(
        fn, batch_format="pyarrow")


def kmeans(emb_ds, k: int, iters: int = 10, **kw):
    """Fit + assign; returns (assignments Dataset, fit dict)."""
    fit = kmeans_fit(emb_ds, k, iters=iters, **kw)
    return kmeans_assign(emb_ds, fit["centroids"],
                         vec_col=kw.get("vec_col", "embedding"),
                         id_col=kw.get("id_col", "vec_id")), fit


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication
# ---------------------------------------------------------------------------

SEMANTIC_CLUSTER_CAP = 20_000


def semantic_dedup(emb_ds, k: int = 64, threshold: float = 0.92,
                   iters: int = 10, id_col: str = "vec_id",
                   vec_col: str = "embedding", num_partitions: int = 16,
                   cluster_cap: int = SEMANTIC_CLUSTER_CAP,
                   centroids: np.ndarray | None = None):
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023):
    k-means partitions the embedding space, cosine near-duplicate
    pairs are found ONLY within each cluster, and connected components
    over the pair graph pick one keeper per semantic duplicate group.
    Returns ``(id_col, cluster, keep)`` (``cluster`` here is the CC
    duplicate-group label, NOT the k-means cell).

    The 100 TB shape: pairwise cosine is quadratic, so the k-means
    cells bound it — within-cell work is ``Σ n_c²·d`` with
    ``n_c ≈ n/k``, and each cell is scored in one co-partitioned
    reducer (``hash_partition_apply`` on the cell id, row-chunked
    GEMMs).  A cell larger than ``cluster_cap`` is truncated to its
    ``cluster_cap`` smallest ids with a LOGGED message (the
    ``BUCKET_CAP`` convention of ``functions/dedup.py``) — at scale
    you raise ``k`` instead.  Documented approximation (inherent to
    SemDeDup): near-duplicates that k-means separates into different
    cells are not compared; the planted-pair pytest uses
    well-separated blobs where this cannot trigger.

    Assignment is fused into the scoring pass (broadcast centroids,
    one extra GEMM per batch) — no assignment shuffle precedes the
    cell exchange."""
    from centrality_gpu_ray.functions.dedup import pairs_to_clusters
    from centrality_gpu_ray.functions.similarity import _normalize
    from centrality_gpu_ray.stages.shuffle import hash_partition_apply

    if centroids is None:
        fit = kmeans_fit(emb_ds, k, iters=iters, vec_col=vec_col,
                         id_col=id_col)
        centroids = fit["centroids"]
    C = np.asarray(centroids, dtype=np.float64)
    cref = ray.put(C)

    def tag(batch: pa.Table) -> pa.Table:
        Cc = ray.get(cref)
        X = _matrix_from_arrow(batch.column(vec_col))
        a, _ = _nearest(X, Cc)
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            vec_col: batch.column(vec_col),
            "cell": pa.array(a.astype(np.int64)),
        })

    tagged = emb_ds.select_columns([id_col, vec_col]).map_batches(
        tag, batch_format="pyarrow")

    def cell_pairs(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        if tbl.num_rows == 0:
            return empty
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cells = tbl.column("cell").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        M = _normalize(_matrix_from_arrow(tbl.column(vec_col)))
        order = np.lexsort((ids, cells))
        ids, cells, M = ids[order], cells[order], M[order]
        bounds = np.r_[0, np.flatnonzero(cells[1:] != cells[:-1]) + 1,
                       cells.size]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        over = 0
        max_over = 0
        for gi in range(bounds.size - 1):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            nc = hi - lo
            if nc < 2:
                continue
            if nc > cluster_cap:
                over += 1
                max_over = max(max_over, nc)
                hi = lo + cluster_cap  # ids are sorted within the cell
                nc = cluster_cap
            Xc = M[lo:hi]
            idc = ids[lo:hi]
            ch = max(1, 4_000_000 // max(nc, 1))
            for rlo in range(0, nc, ch):
                rhi = min(rlo + ch, nc)
                sims = Xc[rlo:rhi] @ Xc.T
                qi, vj = np.nonzero(sims >= threshold)
                qi_g = qi + rlo
                keep = qi_g < vj  # upper triangle: canonical, no self
                out_a.append(idc[qi_g[keep]])
                out_b.append(idc[vj[keep]])
        if over:
            print(f"semantic_dedup cell cap hit: {over} cell(s) over "
                  f"{cluster_cap} vectors (max {max_over}); pairs beyond "
                  "the first cluster_cap sorted ids per cell are dropped "
                  "— raise k to shrink cells")
        if not out_a:
            return empty
        return pa.table({
            "src": pa.array(np.concatenate(out_a)),
            "dst": pa.array(np.concatenate(out_b)),
        })

    dup_pairs = hash_partition_apply(tagged, ["cell"], cell_pairs,
                                     num_partitions=num_partitions) \
        .materialize()
    return pairs_to_clusters(emb_ds, dup_pairs, id_col=id_col,
                             num_partitions=num_partitions)
