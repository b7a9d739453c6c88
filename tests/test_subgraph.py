"""Induced-subgraph extraction: broadcast and Dataset node-set paths
vs a driver oracle, plus composition with communities."""

import numpy as np
import pyarrow as pa
import ray.data

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.graph import Graph
from centrality_gpu_ray.pipelines.subgraph import induced_subgraph


def _edges(seed=6, n=60, m=260):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    keep = s != d
    return pa.table({"src": pa.array((s[keep] * 4 + 1).astype(np.int64)),
                     "dst": pa.array((d[keep] * 4 + 1).astype(np.int64))})


def _oracle_edges(tbl, ids):
    ids = set(ids)
    out = set()
    for a, b in zip(tbl.column("src").to_pylist(),
                    tbl.column("dst").to_pylist()):
        if a in ids and b in ids:
            out.add((min(a, b), max(a, b)))
    return out


def test_broadcast_and_dataset_paths_match_oracle(ray_session):
    tbl = _edges()
    g = Graph(ray.data.from_arrow(tbl), config=EngineConfig())
    ids = list(g.node_ids[::3])
    want = _oracle_edges(tbl, ids)

    sub_b = induced_subgraph(g, ids)
    got_b = _oracle_edges(sub_b.canonical_edges().to_pandas()
                          .pipe(pa.Table.from_pandas), sub_b.node_ids)
    assert got_b == want

    nodes_ds = ray.data.from_arrow(pa.table({
        "node": pa.array(ids, type=pa.int64())}))
    sub_d = induced_subgraph(g, nodes_ds)
    got_d = _oracle_edges(sub_d.canonical_edges().to_pandas()
                          .pipe(pa.Table.from_pandas), sub_d.node_ids)
    assert got_d == want
    # vertex set = induced edge endpoints
    assert set(sub_b.node_ids) == {v for e in want for v in e}


def test_community_extraction_composition(ray_session):
    # carve one planted clique out via louvain labels and analyze it
    from centrality_gpu_ray.pipelines.louvain import louvain

    edges = []
    for c in range(4):
        base = c * 5
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
        edges.append((base, ((c + 1) % 4) * 5))
    tbl = pa.table({"src": pa.array([e[0] for e in edges],
                                    type=pa.int64()),
                    "dst": pa.array([e[1] for e in edges],
                                    type=pa.int64())})
    g = Graph(ray.data.from_arrow(tbl), config=EngineConfig())
    comm = louvain(g).to_pandas()
    members = comm[comm["community"] == 0]["node"].tolist()
    sub = induced_subgraph(g, members)
    # community 0 is the first clique: K5 — 10 edges, 5 vertices
    assert sub.num_vertices == 5
    assert sub.num_edges == 10


def test_sharded_parent_graph(ray_session):
    tbl = _edges(seed=11)
    g = Graph(ray.data.from_arrow(tbl),
              config=EngineConfig(dense_vertex_limit=10))
    assert g.sharded
    g_dense = Graph(ray.data.from_arrow(tbl), config=EngineConfig())
    ids = list(g_dense.node_ids[::4])
    want = _oracle_edges(tbl, ids)
    # the subgraph rebuilds under ITS OWN config — give it the default
    # dense limit so the result is driver-inspectable here
    sub = induced_subgraph(g, ids, config=EngineConfig())
    sub_tbl = pa.Table.from_pandas(sub.canonical_edges().to_pandas())
    got = _oracle_edges(sub_tbl, sub.node_ids)
    assert got == want
