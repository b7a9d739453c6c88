"""SGNS embedding trainer: serial-oracle parity, partitioning
invariance, and the barbell community-separation functional check."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from centrality_gpu_ray.pipelines.embeddings import (
    _draw_negatives, _init_matrix, _noise_cdf, _sigmoid,
    embedding_table, node2vec_embeddings, sgns_train)


def _serial_sgns(centers, contexts, n, dim, neg, iters, lr, seed,
                 noise_power=0.75):
    """Independent pure-numpy re-derivation of the full-batch SGNS
    update (pair-at-a-time loops, no in-block combine, no Arrow) —
    the oracle the distributed pass must match."""
    c = np.asarray(centers, dtype=np.int64)
    x = np.asarray(contexts, dtype=np.int64)
    counts = np.bincount(x, minlength=n).astype(np.float64)
    w = counts ** noise_power
    cdf = np.cumsum(w / w.sum())
    w_in = _init_matrix(n, dim, seed)
    w_out = np.zeros((n, dim))
    m = c.size
    for it in range(iters):
        g_in = np.zeros((n, dim))
        g_out = np.zeros((n, dim))
        c_in = np.zeros(n)
        c_out = np.zeros(n)
        negs = _draw_negatives(c, x, it, neg, seed, cdf) if neg else None
        for i in range(m):
            wc, vx = w_in[c[i]], w_out[x[i]]
            s = 1.0 / (1.0 + np.exp(-wc @ vx))
            g_in[c[i]] += (s - 1.0) * vx
            g_out[x[i]] += (s - 1.0) * wc
            c_in[c[i]] += 1
            c_out[x[i]] += 1
            for j in range(neg):
                nj = negs[i, j]
                sn = 1.0 / (1.0 + np.exp(-wc @ w_out[nj]))
                # center's combined pos+neg gradient counts as ONE
                # contribution per pair (matches the engine's in-block
                # combine); each negative draw counts for its own node
                g_in[c[i]] += sn * w_out[nj]
                g_out[nj] += sn * wc
                c_out[nj] += 1
        lr_t = max(lr * (1.0 - it / max(iters, 1)), 0.1 * lr)
        w_in = w_in - lr_t * g_in / np.maximum(c_in, 1.0)[:, None]
        w_out = w_out - lr_t * g_out / np.maximum(c_out, 1.0)[:, None]
    return w_in, w_out


def _pairs_ds(centers, contexts, parts=3):
    t = pa.table({"center": pa.array(centers, type=pa.int64()),
                  "context": pa.array(contexts, type=pa.int64())})
    return rd.from_arrow(t).repartition(parts)


def test_sgns_serial_parity(ray_session):
    rng = np.random.RandomState(7)
    n, m = 12, 200
    c = rng.randint(0, n, m)
    x = (c + 1 + rng.randint(0, n - 1, m)) % n
    fit = sgns_train(_pairs_ds(c, x), n, dim=6, neg=3, iters=4,
                     lr=0.4, seed=3)
    w_in, w_out = _serial_sgns(c, x, n, 6, 3, 4, 0.4, 3)
    np.testing.assert_allclose(fit["w_in"], w_in, atol=1e-12)
    np.testing.assert_allclose(fit["w_out"], w_out, atol=1e-12)
    assert fit["n_pairs"] == m
    # full-batch GD on a smooth objective: loss must decrease
    assert fit["loss"][-1] < fit["loss"][0]


def test_sgns_partitioning_invariance(ray_session):
    rng = np.random.RandomState(11)
    n, m = 10, 150
    c = rng.randint(0, n, m)
    x = rng.randint(0, n, m)
    a = sgns_train(_pairs_ds(c, x, parts=1), n, dim=4, neg=2, iters=3,
                   lr=0.3, seed=5)
    # different partitioning AND different row order
    o = np.argsort(rng.rand(m))
    b = sgns_train(_pairs_ds(c[o], x[o], parts=7), n, dim=4, neg=2,
                   iters=3, lr=0.3, seed=5)
    np.testing.assert_allclose(a["w_in"], b["w_in"], atol=1e-12)
    np.testing.assert_allclose(a["w_out"], b["w_out"], atol=1e-12)


def test_sgns_no_negatives_and_empty(ray_session):
    fit = sgns_train(_pairs_ds([0, 1], [1, 0]), 3, dim=4, neg=0,
                     iters=2, lr=0.2, seed=1)
    w_in, w_out = _serial_sgns([0, 1], [1, 0], 3, 4, 0, 2, 0.2, 1)
    np.testing.assert_allclose(fit["w_in"], w_in, atol=1e-12)
    empty = sgns_train(_pairs_ds([], []), 3, dim=4, iters=2, seed=1)
    assert empty["n_pairs"] == 0 and empty["loss"] == []
    np.testing.assert_allclose(empty["w_in"], _init_matrix(3, 4, 1))


def test_sgns_barbell_communities(ray_session):
    """Two K5 cliques joined by one bridge edge: walks + SGNS must
    embed within-clique pairs closer (cosine) than cross-clique."""
    from centrality_gpu_ray.pipelines.graph import Graph

    edges = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((4, 5))  # bridge
    g = Graph(rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], type=pa.int64()),
        "dst": pa.array([e[1] for e in edges], type=pa.int64())})))
    emb = node2vec_embeddings(g, dim=8, walk_length=12,
                              walks_per_node=6, window=3, neg=4,
                              iters=40, lr=1.0, seed=2)
    nodes = emb.column("node").to_numpy()
    w = np.vstack([np.asarray(v) for v in
                   emb.column("embedding").to_pylist()])
    w = w / np.linalg.norm(w, axis=1, keepdims=True)
    order = np.argsort(nodes)
    w = w[order]
    cos = w @ w.T
    a = [i for i in range(10) if i < 5]
    b = [i for i in range(10) if i >= 5]
    within = np.mean([cos[i, j] for grp in (a, b) for i in grp
                      for j in grp if i < j])
    across = np.mean([cos[i, j] for i in a for j in b])
    assert within > across + 0.2, (within, across)


def test_embedding_table_layout():
    w = np.arange(12, dtype=np.float64).reshape(3, 4)
    t = embedding_table(w, node_ids=np.array([10, 20, 30]))
    assert t.column("node").to_pylist() == [10, 20, 30]
    assert t.column("embedding").to_pylist()[1] == [4.0, 5.0, 6.0, 7.0]


def test_noise_cdf_and_sigmoid(ray_session):
    ds = _pairs_ds([0, 0, 0], [1, 1, 2], parts=2)
    cdf = _noise_cdf(ds, 4, power=1.0)
    np.testing.assert_allclose(cdf, np.cumsum([0, 2 / 3, 1 / 3, 0]))
    x = np.array([-800.0, -1.0, 0.0, 1.0, 800.0])
    s = _sigmoid(x)
    assert s[0] == 0.0 and s[2] == 0.5 and s[4] == 1.0
    np.testing.assert_allclose(s[1], 1 / (1 + np.e), rtol=1e-12)


def test_sharded_node2vec_matches_dense(ray_session):
    """The full loop on a sharded graph (sharded walks → VertexDict
    remap → owner-resident SGNS) must match the dense loop to float
    association: walks are mode-invariant and the trainers share the
    math, init and update rule."""
    from centrality_gpu_ray.config import EngineConfig
    from centrality_gpu_ray.pipelines.graph import Graph

    rng = np.random.RandomState(3)
    n = 40
    s = rng.randint(0, n, 160)
    d = rng.randint(0, n, 160)
    keep = s != d
    t = pa.table({"src": pa.array((s[keep] * 9 + 4).astype(np.int64)),
                  "dst": pa.array((d[keep] * 9 + 4).astype(np.int64))})
    g_dense = Graph(rd.from_arrow(t))
    g_sh = Graph(rd.from_arrow(t),
                 config=EngineConfig(dense_vertex_limit=10))
    assert g_sh.sharded
    kw = dict(dim=6, walk_length=8, walks_per_node=2, window=2, neg=2,
              iters=3, lr=0.4, seed=4)
    a = node2vec_embeddings(g_dense, **kw)
    b = node2vec_embeddings(g_sh, **kw).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    an = np.argsort(a.column("node").to_numpy())
    aw = np.vstack([np.asarray(v) for v in
                    a.column("embedding").to_pylist()])[an]
    assert b["node"].tolist() == sorted(a.column("node").to_pylist())
    bw = np.stack(b["embedding"].to_numpy())
    np.testing.assert_allclose(bw, aw, atol=1e-9)


def test_node2vec_embeddings_nondense_ids_and_pq(ray_session):
    """Original ids that are NOT 0..n-1 must remap through node_ids
    (latent round-4 fix), and p/q must change the walk corpus."""
    from centrality_gpu_ray.pipelines.graph import Graph

    edges = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((4, 5))
    t = pa.table({
        "src": pa.array([e[0] * 7 + 100 for e in edges], type=pa.int64()),
        "dst": pa.array([e[1] * 7 + 100 for e in edges], type=pa.int64())})
    g = Graph(rd.from_arrow(t))
    emb = node2vec_embeddings(g, dim=4, walk_length=6, walks_per_node=2,
                              window=2, neg=2, iters=3, seed=4)
    nodes = np.sort(emb.column("node").to_numpy())
    assert nodes.tolist() == [i * 7 + 100 for i in range(10)]
    emb_pq = node2vec_embeddings(g, dim=4, walk_length=6,
                                 walks_per_node=2, window=2, neg=2,
                                 iters=3, seed=4, p=0.25, q=4.0)
    a = np.vstack([np.asarray(v) for v in
                   emb.column("embedding").to_pylist()])
    b = np.vstack([np.asarray(v) for v in
                   emb_pq.column("embedding").to_pylist()])
    assert not np.allclose(a, b)


def test_node2vec_trainer_backends_agree(ray_session):
    from centrality_gpu_ray.pipelines.graph import Graph

    rng = np.random.RandomState(8)
    n = 30
    s = rng.randint(0, n, 120)
    d = rng.randint(0, n, 120)
    keep = s != d
    t = pa.table({"src": pa.array((s[keep] * 3).astype(np.int64)),
                  "dst": pa.array((d[keep] * 3).astype(np.int64))})
    g = Graph(rd.from_arrow(t))
    kw = dict(dim=5, walk_length=6, walks_per_node=2, window=2, neg=2,
              iters=3, lr=0.4, seed=6)
    a = node2vec_embeddings(g, trainer="dense", **kw)
    b = node2vec_embeddings(g, trainer="owners", **kw)
    assert a.column("node").to_pylist() == b.column("node").to_pylist()
    aw = np.vstack([np.asarray(v) for v in
                    a.column("embedding").to_pylist()])
    bw = np.vstack([np.asarray(v) for v in
                    b.column("embedding").to_pylist()])
    np.testing.assert_allclose(aw, bw, atol=1e-9)
    with pytest.raises(ValueError, match="unknown trainer"):
        node2vec_embeddings(g, trainer="nope", **kw)
