"""Weighted betweenness vs an independent serial Dijkstra-Brandes
oracle (the reference's dead apsp_graph.cpp:107-172 semantics)."""

import heapq

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.pipelines.brandes import betweenness_centrality
from centrality_gpu_ray.pipelines.graph import Graph


def dijkstra_brandes(nodes, edges):
    """Serial weighted Brandes (ordered pairs): heap Dijkstra per
    source + predecessor accumulation."""
    adj = {v: [] for v in nodes}
    for u, v, w in edges:
        adj[u].append((v, w))
        adj[v].append((u, w))
    bc = {v: 0.0 for v in nodes}
    for src in nodes:
        dist = {v: float("inf") for v in nodes}
        sigma = {v: 0.0 for v in nodes}
        preds = {v: [] for v in nodes}
        dist[src] = 0.0
        sigma[src] = 1.0
        seen = set()
        order = []
        pq = [(0.0, src)]
        while pq:
            d, u = heapq.heappop(pq)
            if u in seen:
                continue
            seen.add(u)
            order.append(u)
            for v, w in adj[u]:
                nd = d + w
                if nd < dist[v]:
                    dist[v] = nd
                    sigma[v] = sigma[u]
                    preds[v] = [u]
                    heapq.heappush(pq, (nd, v))
                elif nd == dist[v] and u not in preds[v]:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = {v: 0.0 for v in nodes}
        for v in reversed(order):
            for u in preds[v]:
                delta[u] += (sigma[u] / sigma[v]) * (1.0 + delta[v])
            if v != src:
                bc[v] += delta[v]
    return bc


def _check(edges):
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    tbl = pa.table({
        "src": pa.array([e[0] for e in edges], type=pa.int64()),
        "dst": pa.array([e[1] for e in edges], type=pa.int64()),
        "weight": pa.array([e[2] for e in edges], type=pa.int64()),
    })
    g = Graph(ray.data.from_arrow(tbl))
    t = betweenness_centrality(g, concurrency=2, weighted=True).to_pandas()
    got = dict(zip(t["node"].astype(int), t["bc"]))
    want = dijkstra_brandes(nodes, edges)
    for v in nodes:
        assert got[v] == pytest.approx(want[v], abs=1e-9), (v, got[v], want[v])


def test_weighted_bc_diamond():
    # weighted diamond where the weighted shortest paths differ from
    # the unweighted ones: 0-1 (4), 0-2 (1), 1-2 (1), 1-3 (2), 2-3 (7)
    _check([(0, 1, 4), (0, 2, 1), (1, 2, 1), (1, 3, 2), (2, 3, 7)])


def test_weighted_bc_equal_weights_matches_unweighted():
    edges = [(0, 1, 1), (0, 2, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1)]
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    tbl = pa.table({
        "src": pa.array([e[0] for e in edges], type=pa.int64()),
        "dst": pa.array([e[1] for e in edges], type=pa.int64()),
        "weight": pa.array([e[2] for e in edges], type=pa.int64()),
    })
    g = Graph(ray.data.from_arrow(tbl))
    a = betweenness_centrality(g, concurrency=2, weighted=True).to_pandas()
    b = betweenness_centrality(g, concurrency=2, weighted=False).to_pandas()
    assert np.allclose(a["bc"], b["bc"], atol=1e-9)


def test_weighted_bc_random_vs_oracle():
    rng = np.random.default_rng(11)
    for _ in range(4):
        n = int(rng.integers(6, 18))
        edges = {}
        for v in range(1, n):
            edges[(int(rng.integers(0, v)), v)] = int(rng.integers(1, 9))
        for _ in range(n):
            a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
            if a != b:
                edges[(min(a, b), max(a, b))] = int(rng.integers(1, 9))
        _check([(u, v, w) for (u, v), w in sorted(edges.items())])
