"""Block-cut-tree decomposed BC must equal plain exact Brandes BC
(the reference's reach-weighted path, ``modified_apsp.cpp:157-260``,
produces the same numbers as whole-graph Brandes — that IS the
decomposition's correctness claim)."""

import numpy as np
import pyarrow as pa
import pytest

from centrality_gpu_ray.pipelines.bc_decomp import betweenness_decomposed
from centrality_gpu_ray.pipelines.brandes import betweenness_centrality
from centrality_gpu_ray.pipelines.graph import Graph
from centrality_gpu_ray.sources.edgelist import FIXTURE_EDGES


def _graph(edges):
    import ray.data

    tbl = pa.table({
        "src": pa.array([u for u, _ in edges], type=pa.int64()),
        "dst": pa.array([v for _, v in edges], type=pa.int64()),
        "weight": pa.array([1] * len(edges), type=pa.int64()),
    })
    return Graph(ray.data.from_arrow(tbl))


def _assert_parity(edges, **kw):
    g = _graph(edges)
    plain = betweenness_centrality(g).to_pandas().sort_values("node")
    m = {}
    dec = betweenness_decomposed(g, metrics=m, **kw) \
        .to_pandas().sort_values("node")
    assert list(plain["node"]) == list(dec["node"])
    np.testing.assert_allclose(dec["bc"].to_numpy(),
                               plain["bc"].to_numpy(),
                               rtol=1e-9, atol=1e-9)
    return m


@pytest.mark.parametrize("name", ["test1", "test2", "test3",
                                  "test4", "test5"])
def test_decomposed_fixture_parity(name):
    _assert_parity(FIXTURE_EDGES[name])


def test_decomposed_pure_tree_is_closed_form_only():
    # path: 0-1-2-3-4 — every BCC is a single edge, zero Brandes work
    m = _assert_parity([(0, 1), (1, 2), (2, 3), (3, 4)])
    assert m["num_bcc_run"] == 0
    assert m["work_decomposed_edge_ops"] == 0
    # star
    m = _assert_parity([(9, 1), (9, 2), (9, 3), (9, 4), (9, 5)])
    assert m["num_bcc_run"] == 0


def test_decomposed_barbell_and_cycle_pendants():
    # two triangles joined by a bridge path, plus pendant hair
    edges = [(0, 1), (1, 2), (2, 0),            # triangle A
             (2, 3), (3, 4),                    # bridge path
             (4, 5), (5, 6), (6, 4),            # triangle B
             (0, 7), (7, 8), (5, 9)]            # pendants
    m = _assert_parity(edges)
    # the two triangles are cliques — the clique skip answers them via
    # closed forms alone, so NO per-BCC Brandes items run at all
    assert m["num_bcc_run"] == 0
    assert m["work_decomposed_edge_ops"] < m["work_plain_edge_ops"]
    # square with a pendant (worked through by hand in the derivation)
    _assert_parity([(0, 1), (1, 2), (2, 3), (3, 0), (0, 4)])


def test_decomposed_multi_component():
    edges = [(0, 1), (1, 2), (2, 0), (2, 3),    # triangle + pendant
             (10, 11), (11, 12),                # separate path
             (20, 21), (21, 22), (22, 23), (23, 20)]  # separate cycle
    _assert_parity(edges)


def test_decomposed_random_graphs_parity():
    rng = np.random.default_rng(17)
    for trial in range(8):
        n = int(rng.integers(10, 70))
        p = float(rng.uniform(0.03, 0.12))
        mask = rng.random((n, n)) < p
        iu, iv = np.triu_indices(n, k=1)
        keep = mask[iu, iv]
        edges = list(zip(iu[keep].tolist(), iv[keep].tolist()))
        # attach pendant chains to random vertices so the block-cut
        # tree is non-trivial
        nxt = n
        for _ in range(int(rng.integers(0, 6))):
            host = int(rng.integers(0, n))
            ln = int(rng.integers(1, 4))
            for _ in range(ln):
                edges.append((host, nxt))
                host = nxt
                nxt += 1
        if not edges:
            continue
        _assert_parity(edges)


def test_decomposed_giant_bcc_splits_items():
    # one dense block big enough to split into several work items
    rng = np.random.default_rng(3)
    n = 40
    iu, iv = np.triu_indices(n, k=1)
    keep = rng.random(iu.size) < 0.5
    edges = list(zip(iu[keep].tolist(), iv[keep].tolist()))
    m = _assert_parity(edges, concurrency=2)
    assert m["num_bcc_run"] >= 1


def _graph_weighted(edges, weights):
    import ray.data

    tbl = pa.table({
        "src": pa.array([u for u, _ in edges], type=pa.int64()),
        "dst": pa.array([v for _, v in edges], type=pa.int64()),
        "weight": pa.array(weights, type=pa.int64()),
    })
    return Graph(ray.data.from_arrow(tbl))


def test_decomposed_weighted_parity():
    rng = np.random.default_rng(29)
    for trial in range(5):
        n = int(rng.integers(8, 40))
        p = float(rng.uniform(0.05, 0.15))
        mask = rng.random((n, n)) < p
        iu, iv = np.triu_indices(n, k=1)
        keep = mask[iu, iv]
        edges = list(zip(iu[keep].tolist(), iv[keep].tolist()))
        nxt = n
        for _ in range(3):  # pendant hair
            host = int(rng.integers(0, n))
            edges.append((host, nxt))
            nxt += 1
        weights = rng.integers(1, 5, size=len(edges)).tolist()
        g = _graph_weighted(edges, weights)
        plain = betweenness_centrality(g, weighted=True) \
            .to_pandas().sort_values("node")
        dec = betweenness_decomposed(g, weighted=True) \
            .to_pandas().sort_values("node")
        np.testing.assert_allclose(dec["bc"].to_numpy(),
                                   plain["bc"].to_numpy(),
                                   rtol=1e-9, atol=1e-9)


def test_decomposed_weighted_rejects_float_weights():
    import ray.data

    tbl = pa.table({"src": pa.array([0, 1], type=pa.int64()),
                    "dst": pa.array([1, 2], type=pa.int64()),
                    "weight": pa.array([0.5, 1.5], type=pa.float64())})
    g = Graph(ray.data.from_arrow(tbl))
    with pytest.raises(ValueError):
        betweenness_decomposed(g, weighted=True)


def _pendant_rich_edges(seed=11):
    rng = np.random.default_rng(seed)
    n = 40
    iu, iv = np.triu_indices(n, k=1)
    keep = rng.random(iu.size) < 0.08
    edges = list(zip(iu[keep].tolist(), iv[keep].tolist()))
    nxt = n
    for _ in range(6):
        host = int(rng.integers(0, n))
        for _ in range(int(rng.integers(1, 4))):
            edges.append((host, nxt))
            host = nxt
            nxt += 1
    edges += [(500, 501), (501, 502), (502, 500), (502, 503)]  # island
    return edges


def _graphs_dense_sharded(edges, weights=None):
    import ray.data

    from centrality_gpu_ray.config import EngineConfig

    tbl = pa.table({
        "src": pa.array([u for u, _ in edges], type=pa.int64()),
        "dst": pa.array([v for _, v in edges], type=pa.int64()),
        "weight": pa.array(weights if weights is not None
                           else [1] * len(edges), type=pa.int64()),
    })
    dense = Graph(ray.data.from_arrow(tbl), config=EngineConfig())
    sharded = Graph(ray.data.from_arrow(tbl),
                    config=EngineConfig(dense_vertex_limit=10))
    return dense, sharded


def test_decomposed_distributed_parity():
    edges = _pendant_rich_edges()
    dense, sharded = _graphs_dense_sharded(edges)
    ref = betweenness_centrality(dense).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    m = {}
    out = betweenness_decomposed(sharded, metrics=m).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert m["mode"] == "distributed"
    assert list(ref["node"]) == list(out["node"])
    np.testing.assert_allclose(out["bc"].to_numpy(), ref["bc"].to_numpy(),
                               rtol=1e-9, atol=1e-9)


def test_decomposed_distributed_weighted_parity():
    edges = _pendant_rich_edges(seed=23)
    rng = np.random.default_rng(7)
    weights = rng.integers(1, 4, size=len(edges)).tolist()
    dense, sharded = _graphs_dense_sharded(edges, weights)
    ref = betweenness_centrality(dense, weighted=True).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    out = betweenness_decomposed(sharded, weighted=True).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    np.testing.assert_allclose(out["bc"].to_numpy(), ref["bc"].to_numpy(),
                               rtol=1e-9, atol=1e-9)


def test_decomposed_distributed_giant_bcc_cap_is_loud():
    from centrality_gpu_ray.config import EngineConfig
    import ray.data

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]  # one 5-edge BCC
    tbl = pa.table({
        "src": pa.array([u for u, _ in edges], type=pa.int64()),
        "dst": pa.array([v for _, v in edges], type=pa.int64()),
        "weight": pa.array([1] * len(edges), type=pa.int64()),
    })
    cfg = EngineConfig(dense_vertex_limit=2)
    cfg.extra["decomp_bcc_edge_cap"] = 2
    g = Graph(ray.data.from_arrow(tbl), config=cfg)
    with pytest.raises(Exception, match="decomp_bcc_edge_cap"):
        betweenness_decomposed(g).to_pandas()


def test_decomposed_distributed_biconnected_no_art():
    # cycle + chord: zero articulation points — the informative-mass
    # side is EMPTY and the edges-only partition fallback must still
    # run the per-BCC Brandes (regression: an empty co-partition side
    # silently dropped every edge)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2)]
    dense, sharded = _graphs_dense_sharded(edges)
    ref = betweenness_centrality(dense).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    out = betweenness_decomposed(sharded).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert ref["bc"].to_numpy().sum() > 0  # non-trivial BC exists
    np.testing.assert_allclose(out["bc"].to_numpy(), ref["bc"].to_numpy(),
                               rtol=1e-9, atol=1e-9)


def test_orders_bcc_labels_closed_form():
    # star forest: every edge its own BCC; the deterministic label is
    # the CHILD endpoint's dense id (= #customers + rank of the order
    # in sorted order ids) — the closed form the SQL oracle used before
    # this check moved to pytest (the driver row stays on the cyclic
    # lineitem graph to keep rule-A/rule-B under the external gate)
    import pandas as pd

    from centrality_gpu_ray import graph_queries as gq

    sf = "/root/testdata/sf0.001"
    got = gq.orders_bcc_labels(sf).to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    orders = pd.read_parquet(f"{sf}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    ncust = orders["o_custkey"].nunique()
    want = pd.DataFrame({
        "src": orders["o_custkey"].astype("int64"),
        "dst": orders["o_orderkey"].astype("int64") + 10_000_000,
    })
    want = want.sort_values(["dst"]).reset_index(drop=True)
    want["bcc"] = np.arange(len(want), dtype=np.int64) + ncust
    want = want.sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _clique_pendant_edges():
    """Blocks that are pure cliques (K3, K4, K5) joined by bridges and
    pendant chains — exercises the reducer's vectorized clique skip
    (a clique block has no interior shortest paths; the closed forms
    carry its whole answer) against plain whole-graph Brandes."""
    edges = []
    base = 0
    for k in (3, 4, 5):
        vs = list(range(base, base + k))
        edges += [(vs[i], vs[j]) for i in range(k) for j in range(i + 1, k)]
        base += k
    edges += [(0, 3), (4, 8)]          # bridges chaining the cliques
    edges += [(7, 100), (100, 101), (101, 102)]   # pendant chain on K5
    edges += [(1, 200)]                # pendant on K3
    return edges


def test_decomposed_distributed_clique_blocks_parity():
    edges = _clique_pendant_edges()
    dense, sharded = _graphs_dense_sharded(edges)
    ref = betweenness_centrality(dense).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    m = {}
    out = betweenness_decomposed(sharded, metrics=m).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert m["mode"] == "distributed"
    assert list(ref["node"]) == list(out["node"])
    np.testing.assert_allclose(out["bc"].to_numpy(), ref["bc"].to_numpy(),
                               rtol=1e-9, atol=1e-9)


def test_decomposed_distributed_weighted_clique_blocks():
    """Equal-weight cliques skip; an UNEQUAL-weight clique must NOT
    (w(u,v) > w(u,x)+w(x,v) re-routes pairs through interior
    vertices) — parity vs plain weighted Brandes covers both."""
    edges = _clique_pendant_edges()
    # weight 5 on one K4 edge makes its 2-hop detour (1+1) shorter:
    # vertex-interior shortest paths exist inside that clique block
    weights = [1] * len(edges)
    k4_first = 3  # edges are K3's 3 rows, then K4's 6 rows
    weights[k4_first] = 5
    dense, sharded = _graphs_dense_sharded(edges, weights)
    ref = betweenness_centrality(dense, weighted=True).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    out = betweenness_decomposed(sharded, weighted=True).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    np.testing.assert_allclose(out["bc"].to_numpy(), ref["bc"].to_numpy(),
                               rtol=1e-9, atol=1e-9)


def test_decomposed_dense_clique_blocks_parity():
    """Dense-path clique skip: K3/K4/K5 blocks contribute only their
    closed forms; metrics confirm no per-BCC Brandes items ran."""
    m = _assert_parity(_clique_pendant_edges())
    assert m["num_bcc_run"] == 0  # every block is a clique or an edge


def test_decomposed_dense_weighted_unequal_clique_runs():
    """A K4 with one heavy edge re-routes pairs through interior
    vertices — the dense weighted path must NOT skip it."""
    edges = _clique_pendant_edges()
    weights = [1] * len(edges)
    weights[3] = 5  # first K4 edge (after K3's 3 rows)
    dense, _ = _graphs_dense_sharded(edges, weights)
    ref = betweenness_centrality(dense, weighted=True).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    m = {}
    out = betweenness_decomposed(dense, weighted=True, metrics=m) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert m["num_bcc_run"] >= 1  # the unequal-weight K4 ran
    np.testing.assert_allclose(out["bc"].to_numpy(), ref["bc"].to_numpy(),
                               rtol=1e-9, atol=1e-9)
