"""Weighted PageRank (strength-normalized) across execution paths."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.graph import Graph
from centrality_gpu_ray.pipelines.pagerank import pagerank


def _weighted_graph():
    t = pa.table({
        "src": pa.array([0, 0, 1, 2, 2, 3], type=pa.int64()),
        "dst": pa.array([1, 2, 2, 3, 4, 4], type=pa.int64()),
        "weight": pa.array([5, 1, 2, 1, 3, 1], type=pa.int64()),
    })
    return ray.data.from_arrow(t)


def _oracle(edges, weights, n, alpha=0.85, iters=5000):
    st = np.zeros(n)
    for (u, v), w in zip(edges, weights):
        st[u] += w
        st[v] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.zeros(n)
        for (u, v), w in zip(edges, weights):
            new[v] += r[u] / st[u] * w
            new[u] += r[v] / st[v] * w
        new = (1 - alpha) / n + alpha * new
        if np.abs(new - r).sum() < 1e-14:
            return new
        r = new
    return r


@pytest.mark.parametrize("mode", ["local", "distributed"])
def test_weighted_pagerank_matches_oracle(mode):
    cfg = EngineConfig(tolerance=1e-12, max_supersteps=1000)
    g = Graph(_weighted_graph(), config=cfg, mode=mode)
    out = pagerank(g, cfg, weighted=True).to_pandas().sort_values("node")
    oracle = _oracle([(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4)],
                     [5, 1, 2, 1, 3, 1], 5)
    assert np.allclose(out["pagerank"].values, oracle, atol=1e-9)
    # weighted differs from unweighted (sanity that the flag matters)
    unw = pagerank(g, cfg, weighted=False).to_pandas().sort_values("node")
    assert not np.allclose(out["pagerank"].values, unw["pagerank"].values,
                           atol=1e-6)
