"""ANN search: brute-force exactness and LSH recall."""

import numpy as np
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def emb_np(emb):
    df = emb.to_pandas().sort_values("vec_id")
    return df["vec_id"].to_numpy(), np.stack(df["embedding"].to_numpy()).astype(np.float64)


def _numpy_topk(ids, M, Q, k):
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    sims = Qn @ Mn.T
    out = {}
    for qi in range(Q.shape[0]):
        order = np.lexsort((ids, -sims[qi]))[:k]
        out[qi] = ids[order].tolist()
    return out


def test_ann_brute_force_exact(emb, emb_np):
    from centrality_gpu_ray.functions.similarity import ann_brute_force

    ids, M = emb_np
    Q = M[:5]
    res = ann_brute_force(emb, Q, k=10).to_pandas()
    oracle = _numpy_topk(ids, M, Q, 10)
    for qi in range(5):
        got = res[res.query_id == qi].sort_values("rank")["vec_id"].tolist()
        assert got == oracle[qi], qi
    # self-match is rank 1 with score ~1
    top = res[(res.query_id == 0) & (res["rank"] == 1)]
    assert top["score"].iloc[0] == pytest.approx(1.0, abs=1e-9)


def test_ann_lsh_recall(emb, emb_np):
    from centrality_gpu_ray.functions.similarity import ann_lsh

    ids, M = emb_np
    Q = M[:5]
    res = ann_lsh(emb, Q, k=10, tables=12, bits=6).to_pandas()
    oracle = _numpy_topk(ids, M, Q, 10)
    recalls = []
    for qi in range(5):
        got = set(res[res.query_id == qi]["vec_id"].tolist())
        recalls.append(len(got & set(oracle[qi])) / 10)
    assert np.mean(recalls) >= 0.5, recalls  # approximate, but useful
    # deterministic
    res2 = ann_lsh(emb, Q, k=10, tables=12, bits=6).to_pandas()
    a = res.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = res2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a[["query_id", "vec_id"]].equals(b[["query_id", "vec_id"]])


def test_ann_ivf_exact_when_all_lists_probed(emb, emb_np):
    """nprobe == nlist probes every inverted list → exact top-k."""
    from centrality_gpu_ray.functions.similarity import ann_ivf

    ids, M = emb_np
    Q = M[:5]
    res = ann_ivf(emb, Q, k=10, nlist=8, nprobe=8,
                  train_sample=256).to_pandas()
    oracle = _numpy_topk(ids, M, Q, 10)
    for qi in range(5):
        got = res[res.query_id == qi].sort_values("rank")["vec_id"].tolist()
        assert got == oracle[qi], qi


def test_ann_ivf_recall_on_clustered_data():
    """Separable gaussian clusters: IVF with a few probes recovers the
    brute-force neighbors (the quantizer aligns with the clusters)."""
    import pyarrow as pa

    from centrality_gpu_ray.functions.similarity import ann_ivf

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((6, 16)) * 6.0
    M = np.concatenate([c + rng.standard_normal((200, 16))
                        for c in centers])
    ids = np.arange(M.shape[0], dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(M.astype(np.float64).ravel()), 16),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)
    Q = M[::150][:6]
    res = ann_ivf(ds, Q, k=10, nlist=12, nprobe=4,
                  train_sample=600).to_pandas()
    oracle = _numpy_topk(ids, M, Q, 10)
    hits = total = 0
    for qi in range(Q.shape[0]):
        got = set(res[res.query_id == qi]["vec_id"].tolist())
        hits += len(got & set(oracle[qi]))
        total += 10
    assert hits / total >= 0.9, hits / total


def test_project_embeddings_jl():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from centrality_gpu_ray.functions.similarity import (
        _matrix_from_arrow, project_embeddings)

    sf = "/root/testdata/sf0.01"
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    out = project_embeddings(emb, out_dim=8, seed=5)
    t = pa.concat_tables(out.iter_batches(batch_size=None,
                                          batch_format="pyarrow"))
    order = np.argsort(t.column("vec_id").to_numpy())
    Y = _matrix_from_arrow(t.column("embedding"))[order]
    assert Y.shape[1] == 8
    # parity vs a serial numpy projection with the same seed
    import pyarrow.parquet as pq
    src = pq.read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    sorder = np.argsort(src.column("vec_id").to_numpy())
    X = _matrix_from_arrow(src.column("embedding"))[sorder]
    R = np.random.default_rng(5).standard_normal((X.shape[1], 8)) / np.sqrt(8)
    assert np.allclose(Y, X @ R, atol=1e-12)
    # partitioning invariance (same R derived in every task)
    out2 = project_embeddings(emb.repartition(7), out_dim=8, seed=5)
    t2 = pa.concat_tables(out2.iter_batches(batch_size=None,
                                            batch_format="pyarrow"))
    o2 = np.argsort(t2.column("vec_id").to_numpy())
    assert np.allclose(_matrix_from_arrow(t2.column("embedding"))[o2], Y)


def test_ann_ivf_with_external_kmeans_centroids():
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from centrality_gpu_ray.functions.clustering import kmeans_fit
    from centrality_gpu_ray.functions.similarity import (
        _matrix_from_arrow, _normalize, ann_brute_force, ann_ivf)

    sf = "/root/testdata/sf0.01"
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    src = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    Q = _matrix_from_arrow(src.column("embedding"))[:3]
    fit = kmeans_fit(emb, k=8, iters=5)
    # nprobe == nlist probes every list → exact, matching brute force
    got = ann_ivf(emb, Q, k=5, nprobe=8,
                  centroids=fit["centroids"]).to_pandas()
    want = ann_brute_force(emb, Q, k=5).to_pandas()
    key = ["query_id", "vec_id"]
    a = got.sort_values(key).reset_index(drop=True)
    b = want.sort_values(key).reset_index(drop=True)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    assert np.allclose(a["score"], b["score"], atol=1e-12)
