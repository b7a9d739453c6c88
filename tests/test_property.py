"""Property-based cross-checks (hypothesis): engine operators vs tiny
pure-Python oracles on randomly generated edge lists.

The fixed-seed random-graph tests elsewhere pin known shapes; these
let hypothesis hunt for the shapes nobody hand-picked — parallel edges
in both orientations, self-loops, disconnected singletons, pendant
chains into cliques — and shrink any failure to a minimal edge list.
Every oracle here is an INDEPENDENT serial algorithm (union-find,
brute-force vertex/edge removal, heapq Dijkstra, textbook Brandes,
dense power iteration), not a second path through the engine.

Examples are deliberately tiny (n <= 10): each one drives full Ray
Data pipelines through the session-scoped 4-CPU fixture, so the
budget is ~10 examples per property. ``derandomize=True`` keeps the
suite reproducible run-to-run (no flaky CI from a fresh random seed).
"""

from __future__ import annotations

import heapq
from collections import defaultdict

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.graph import Graph

SETTINGS = dict(max_examples=10, deadline=None, derandomize=True,
                suppress_health_check=[HealthCheck.too_slow,
                                       HealthCheck.data_too_large])


# ---------------------------------------------------------------------------
# strategies + shared oracles
# ---------------------------------------------------------------------------

@st.composite
def edge_lists(draw, max_n: int = 10, weighted: bool = False):
    """Random multigraph: duplicate edges, both orientations and
    self-loops allowed (the engine must canonicalize them all away);
    always contains at least one non-loop edge."""
    n = draw(st.integers(2, max_n))
    pairs = draw(st.lists(st.tuples(st.integers(0, n - 1),
                                    st.integers(0, n - 1)),
                          min_size=1, max_size=2 * max_n))
    a = draw(st.integers(0, n - 2))
    pairs.append((a, a + 1))
    if not weighted:
        return pairs
    w = draw(st.lists(st.integers(1, 5), min_size=len(pairs),
                      max_size=len(pairs)))
    return pairs, w


def _graph(edges, weights=None, **gkw) -> Graph:
    import ray.data

    tbl = pa.table({
        "src": pa.array([u for u, _ in edges], type=pa.int64()),
        "dst": pa.array([v for _, v in edges], type=pa.int64()),
        "weight": pa.array(list(weights) if weights is not None
                           else [1] * len(edges), type=pa.int64()),
    })
    return Graph(ray.data.from_arrow(tbl), **gkw)


def _canonical(edges, weights=None) -> dict[tuple[int, int], int]:
    """The engine's documented normalization (stages/edges.py): drop
    self-loops, canonical (min,max) key, duplicate weights summed."""
    w = list(weights) if weights is not None else [1] * len(edges)
    agg: dict[tuple[int, int], int] = {}
    for (u, v), wt in zip(edges, w):
        if u == v:
            continue
        key = (min(u, v), max(u, v))
        agg[key] = agg.get(key, 0) + wt
    return agg


def _adj(canon) -> dict[int, set[int]]:
    adj: dict[int, set[int]] = defaultdict(set)
    for (u, v) in canon:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def _num_components(nodes, adj, skip_node=None, skip_edge=None) -> int:
    seen: set[int] = set()
    comps = 0
    for s in nodes:
        if s in seen or s == skip_node:
            continue
        comps += 1
        stack = [s]
        seen.add(s)
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y == skip_node or y in seen:
                    continue
                if skip_edge is not None and {x, y} == skip_edge:
                    continue
                seen.add(y)
                stack.append(y)
    return comps


# ---------------------------------------------------------------------------
# normalization: dedup + canonicalize + relabel (O5/M1/M2/M4)
# ---------------------------------------------------------------------------

@given(ew=edge_lists(weighted=True))
@settings(**SETTINGS)
def test_graph_normalization_vs_oracle(ew):
    edges, weights = ew
    canon = _canonical(edges, weights)
    g = _graph(edges, weights)
    nodes = sorted({x for e in canon for x in e})
    assert list(g.node_ids) == nodes
    s, d, w = g.local_arrays()
    got = {(int(g.node_ids[a]), int(g.node_ids[b])): int(c)
           for a, b, c in zip(s, d, w)}
    assert got == canon


# ---------------------------------------------------------------------------
# connected components vs union-find
# ---------------------------------------------------------------------------

@given(edges=edge_lists())
@settings(**SETTINGS)
def test_components_vs_union_find(edges):
    from centrality_gpu_ray.pipelines.components import connected_components

    canon = _canonical(edges)
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (u, v) in canon:
        parent[find(u)] = find(v)
    expect = {}
    roots: dict[int, int] = {}
    for x in sorted(parent):
        roots.setdefault(find(x), x)  # min id reaches each root first
    for x in parent:
        expect[x] = roots[find(x)]

    got = connected_components(_graph(edges)).to_pandas()
    assert {int(r.node): int(r.component)
            for r in got.itertuples()} == expect


# ---------------------------------------------------------------------------
# articulation points + bridges vs brute-force removal
# ---------------------------------------------------------------------------

@given(edges=edge_lists())
@settings(**SETTINGS)
def test_articulation_and_bridges_vs_removal(edges):
    from centrality_gpu_ray.pipelines.bicc import (articulation_points,
                                                   bridges)

    canon = _canonical(edges)
    adj = _adj(canon)
    nodes = sorted(adj)
    base = _num_components(nodes, adj)
    expect_art = {v: _num_components(nodes, adj, skip_node=v) > base
                  for v in nodes}
    expect_bridge = {
        e: _num_components(nodes, adj, skip_edge=set(e)) > base
        for e in canon}

    g = _graph(edges)
    art = articulation_points(g).to_pandas()
    assert {int(r.node): bool(r.is_articulation)
            for r in art.itertuples()} == expect_art
    br = bridges(g).to_pandas()
    assert {(int(r.src), int(r.dst)): bool(r.is_bridge)
            for r in br.itertuples()} == expect_bridge


# ---------------------------------------------------------------------------
# SSSP vs heapq Dijkstra (weighted; duplicate weights sum first)
# ---------------------------------------------------------------------------

@given(ew=edge_lists(weighted=True))
@settings(**SETTINGS)
def test_sssp_vs_dijkstra(ew):
    from centrality_gpu_ray.pipelines.sssp import sssp

    edges, weights = ew
    canon = _canonical(edges, weights)
    nodes = sorted({x for e in canon for x in e})
    src = nodes[0]
    wadj: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for (u, v), wt in canon.items():
        wadj[u].append((v, wt))
        wadj[v].append((u, wt))
    dist = {src: 0}
    pq = [(0, src)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, 1 << 60):
            continue
        for v, wt in wadj[u]:
            nd = du + wt
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))

    got = sssp(_graph(edges, weights), src).to_pandas()
    assert {int(r.node): int(r.distance) for r in got.itertuples()} \
        == {v: dist.get(v, -1) for v in nodes}


# ---------------------------------------------------------------------------
# exact BC: textbook serial Brandes vs BOTH engine paths (plain actor
# pool and the BCC-decomposed form) in one shot
# ---------------------------------------------------------------------------

def _serial_brandes(nodes, adj) -> dict[int, float]:
    bc = {v: 0.0 for v in nodes}
    for s in nodes:
        stack, pred = [], {v: [] for v in nodes}
        sigma = {v: 0.0 for v in nodes}
        dist = {v: -1 for v in nodes}
        sigma[s], dist[s] = 1.0, 0
        queue = [s]
        while queue:
            v = queue.pop(0)
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    queue.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = {v: 0.0 for v in nodes}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc  # ordered-pair counts (no /2), matching the engine


@given(edges=edge_lists(max_n=8))
@settings(**SETTINGS)
def test_betweenness_vs_serial_brandes(edges):
    from centrality_gpu_ray.pipelines.bc_decomp import \
        betweenness_decomposed
    from centrality_gpu_ray.pipelines.brandes import betweenness_centrality

    canon = _canonical(edges)
    adj = _adj(canon)
    nodes = sorted(adj)
    expect = _serial_brandes(nodes, adj)

    g = _graph(edges)
    for table in (betweenness_centrality(g, concurrency=2),
                  betweenness_decomposed(g, concurrency=2)):
        got = table.to_pandas()
        np.testing.assert_allclose(
            got.sort_values("node")["bc"].to_numpy(),
            np.array([expect[v] for v in nodes]),
            rtol=1e-9, atol=1e-9)


# ---------------------------------------------------------------------------
# k-core peel vs serial fixpoint peel
# ---------------------------------------------------------------------------

@given(edges=edge_lists(), k=st.integers(2, 4))
@settings(**SETTINGS)
def test_peel_core_vs_serial(edges, k):
    from centrality_gpu_ray.pipelines.peel import peel

    canon = _canonical(edges)
    adj = {v: set(ns) for v, ns in _adj(canon).items()}
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
    expect_core = {(u, v) for (u, v) in canon
                   if u in adj and v in adj[u]}

    _, core_edges = peel(_graph(edges), k=k)
    got = {(int(u), int(v))
           for u, v in zip(core_edges.column("src").to_pylist(),
                           core_edges.column("dst").to_pylist())}
    assert got == expect_core


# ---------------------------------------------------------------------------
# PageRank vs dense power iteration (symmetrized graph has no dangling
# vertices, so the fixpoint is unique and oracle-computable exactly)
# ---------------------------------------------------------------------------

@given(edges=edge_lists())
@settings(**SETTINGS)
def test_pagerank_vs_power_iteration(edges):
    from centrality_gpu_ray.pipelines.pagerank import pagerank

    canon = _canonical(edges)
    nodes = sorted({x for e in canon for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for (u, v) in canon:
        A[idx[u], idx[v]] = A[idx[v], idx[u]] = 1.0
    M = A / A.sum(axis=1, keepdims=True)
    d = 0.85
    r = np.full(n, 1.0 / n)
    for _ in range(2000):
        nxt = (1 - d) / n + d * (M.T @ r)
        if np.abs(nxt - r).sum() < 1e-14:
            r = nxt
            break
        r = nxt

    cfg = EngineConfig(tolerance=1e-12, max_supersteps=2000)
    got = pagerank(_graph(edges), cfg).to_pandas().sort_values("node")
    np.testing.assert_allclose(got["pagerank"].to_numpy(), r, atol=1e-8)
    assert abs(got["pagerank"].sum() - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# hash_aggregate (the engine's groupby workhorse) vs pandas groupby
# ---------------------------------------------------------------------------

@given(rows=st.lists(st.tuples(st.integers(0, 6), st.text("abc", max_size=2),
                               st.integers(-50, 50)),
                     min_size=1, max_size=40),
       nparts=st.integers(1, 5))
@settings(**SETTINGS)
def test_hash_aggregate_vs_pandas(rows, nparts):
    import pandas as pd
    import ray.data

    from centrality_gpu_ray.stages.shuffle import hash_aggregate

    tbl = pa.table({
        "k1": pa.array([r[0] for r in rows], type=pa.int64()),
        "k2": pa.array([r[1] for r in rows], type=pa.string()),
        "val": pa.array([r[2] for r in rows], type=pa.int64()),
    })
    got = hash_aggregate(ray.data.from_arrow(tbl), ["k1", "k2"],
                         [("val", "sum"), ("val", "count")],
                         num_partitions=nparts).to_pandas()
    expect = (tbl.to_pandas().groupby(["k1", "k2"], as_index=False)
              .agg(val=("val", "sum"), count=("val", "count")))
    lhs = got.sort_values(["k1", "k2"]).reset_index(drop=True)
    rhs = expect.sort_values(["k1", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        lhs[["k1", "k2", "val", "count"]],
        rhs[["k1", "k2", "val", "count"]],
        check_dtype=False)
