"""Louvain community detection: planted-structure exactness, Q
cross-check against the distributed modularity scorer, determinism,
weighted behavior, envelope guards."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.graph import Graph
from centrality_gpu_ray.pipelines.louvain import louvain


def _ring_of_cliques(k: int = 8, size: int = 5, wt: int = 1):
    edges = []
    for c in range(k):
        base = c * size
        for i in range(size):
            for j in range(i + 1, size):
                edges.append((base + i, base + j, wt))
        edges.append((base, ((c + 1) % k) * size, 1))  # ring link
    return pa.table({
        "src": pa.array([e[0] for e in edges], type=pa.int64()),
        "dst": pa.array([e[1] for e in edges], type=pa.int64()),
        "weight": pa.array([e[2] for e in edges], type=pa.int64()),
    })


def _graph(tbl, parts=3, **cfg):
    return Graph(ray.data.from_arrow(tbl).repartition(parts),
                 config=EngineConfig(**cfg))


def test_ring_of_cliques_found_exactly(ray_session):
    m = {}
    out = louvain(_graph(_ring_of_cliques()), metrics=m).to_pandas()
    # every clique is one community, communities = k
    assert m["communities"] == 8
    for c in range(8):
        members = out[out["node"].isin(range(c * 5, (c + 1) * 5))]
        assert members["community"].nunique() == 1
        # community id = min original member id
        assert members["community"].iloc[0] == c * 5
    assert m["modularity"] > 0.7


def test_q_crosschecks_distributed_scorer(ray_session):
    from centrality_gpu_ray.pipelines.community import (community_stats,
                                                        modularity_score)

    tbl = _ring_of_cliques(k=6, size=4)
    g = _graph(tbl)
    m = {}
    out = louvain(g, metrics=m)
    labels = out.rename_columns(["node", "label"])
    q = modularity_score(community_stats(g.canonical_edges(), labels,
                                         weighted=True))
    assert abs(q["q_micro"] / 1e6 - m["modularity"]) < 2e-6


def test_beats_singletons_and_labelprop(ray_session):
    from centrality_gpu_ray.pipelines.community import (community_stats,
                                                        modularity_score)
    from centrality_gpu_ray.pipelines.labelprop import label_propagation

    rng = np.random.default_rng(3)
    # two noisy blobs + sparse cross links
    edges = set()
    for base in (0, 20):
        for _ in range(120):
            a, b = rng.integers(base, base + 20, 2)
            if a != b:
                edges.add((min(a, b), max(a, b)))
    for _ in range(6):
        a = int(rng.integers(0, 20))
        b = int(rng.integers(20, 40))
        edges.add((a, b))
    tbl = pa.table({
        "src": pa.array([e[0] for e in edges], type=pa.int64()),
        "dst": pa.array([e[1] for e in edges], type=pa.int64()),
    })
    g = _graph(tbl)
    m = {}
    louvain(g, metrics=m)
    assert m["modularity"] > 0.0  # singletons score < 0
    lp = label_propagation(g).to_pandas()
    q_lp = modularity_score(community_stats(
        g.canonical_edges(),
        pa.table({"node": pa.array(lp["node"], type=pa.int64()),
                  "label": pa.array(lp["label"], type=pa.int64())})))
    assert m["modularity"] >= q_lp["q_micro"] / 1e6 - 1e-9


def test_deterministic(ray_session):
    tbl = _ring_of_cliques(k=5, size=4)
    a = louvain(_graph(tbl, parts=2)).to_pandas()
    b = louvain(_graph(tbl, parts=7)).to_pandas()
    merged = a.merge(b, on="node", suffixes=("_a", "_b"))
    assert (merged["community_a"] == merged["community_b"]).all()


def test_weighted_attraction(ray_session):
    # heavy intra-pair weights pull the pair together even with more
    # unit edges elsewhere
    tbl = pa.table({
        "src": pa.array([0, 0, 1, 2], type=pa.int64()),
        "dst": pa.array([1, 2, 2, 3], type=pa.int64()),
        "weight": pa.array([10, 1, 1, 10], type=pa.int64()),
    })
    out = louvain(_graph(tbl)).to_pandas().set_index("node")
    assert out.loc[0, "community"] == out.loc[1, "community"]
    assert out.loc[2, "community"] == out.loc[3, "community"]
    assert out.loc[0, "community"] != out.loc[2, "community"]


def test_sharded_rejected(ray_session):
    tbl = _ring_of_cliques(k=4, size=4)
    g = Graph(ray.data.from_arrow(tbl),
              config=EngineConfig(dense_vertex_limit=4))
    with pytest.raises(ValueError, match="dense envelope"):
        louvain(g)


def test_louvain_coarse_sharded_planted(ray_session):
    """Scale path on a SHARDED planted graph: LP pre-clusters the
    cliques, the contracted super-graph gets the exact kernel, final
    communities keep every clique together with high Q."""
    from centrality_gpu_ray.pipelines.community import (community_stats,
                                                        modularity_score)
    from centrality_gpu_ray.pipelines.louvain import louvain_coarse

    tbl = _ring_of_cliques(k=10, size=5)
    g = Graph(ray.data.from_arrow(tbl),
              config=EngineConfig(dense_vertex_limit=10))
    assert g.sharded
    m = {}
    out = louvain_coarse(g, metrics=m).to_pandas()
    assert m["coarse_vertices"] <= 10  # LP collapsed the cliques
    # every clique stays within one community
    for c in range(10):
        members = out[out["node"].isin(range(c * 5, (c + 1) * 5))]
        assert members["community"].nunique() == 1
    q = modularity_score(community_stats(
        g.canonical_edges(),
        pa.table({"node": pa.array(out["node"], type=pa.int64()),
                  "label": pa.array(out["community"],
                                    type=pa.int64())}),
        weighted=True))
    assert q["q_micro"] / 1e6 > 0.5
    assert abs(q["q_micro"] / 1e6 - m["modularity"]) < 2e-6


def test_louvain_coarse_matches_dense_quality(ray_session):
    """On the dense path's own input the coarse composition must not
    lose (much) modularity vs full Louvain."""
    from centrality_gpu_ray.pipelines.louvain import louvain_coarse

    tbl = _ring_of_cliques(k=8, size=5)
    m_full, m_coarse = {}, {}
    louvain(_graph(tbl), metrics=m_full)
    louvain_coarse(_graph(tbl), metrics=m_coarse)
    assert m_coarse["modularity"] >= m_full["modularity"] - 0.05
