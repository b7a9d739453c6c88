"""Articulation points vs an independent serial Tarjan oracle
(reference behavior: ``bicc.cpp:81-161``)."""

import numpy as np
import pytest

from centrality_gpu_ray.pipelines.bicc import articulation_points
from centrality_gpu_ray.pipelines.graph import Graph
from centrality_gpu_ray.sources.edgelist import FIXTURE_EDGES, fixture_dataset


def tarjan_articulation(n_nodes: set, edges: list) -> set:
    """Iterative serial Tarjan — the textbook DFS low-link oracle."""
    adj: dict = {v: [] for v in n_nodes}
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    visited, disc, low, parent = set(), {}, {}, {}
    art = set()
    timer = [0]
    for root in sorted(n_nodes):
        if root in visited:
            continue
        stack = [(root, iter(adj[root]))]
        visited.add(root)
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        root_children = 0
        while stack:
            v, it = stack[-1]
            advanced = False
            for w in it:
                if w not in visited:
                    visited.add(w)
                    parent[w] = v
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    if v == root:
                        root_children += 1
                    stack.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w != parent.get(v):
                    low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[v])
                    if p != root and low[v] >= disc[p]:
                        art.add(p)
        if root_children >= 2:
            art.add(root)
    return art


def _check(edges):
    import ray.data
    import pyarrow as pa

    nodes = {u for u, _ in edges} | {v for _, v in edges}
    tbl = pa.table({
        "src": pa.array([u for u, _ in edges], type=pa.int64()),
        "dst": pa.array([v for _, v in edges], type=pa.int64()),
        "weight": pa.array([1] * len(edges), type=pa.int64()),
    })
    g = Graph(ray.data.from_arrow(tbl))
    m = {}
    out = articulation_points(g, metrics=m).to_pandas()
    got = set(out.loc[out.is_articulation, "node"].astype(int))
    want = tarjan_articulation(nodes, edges)
    assert got == want, (sorted(got), sorted(want))
    assert m["num_articulation_points"] == len(want)


@pytest.mark.parametrize("name", ["test1", "test2", "test3", "test4", "test5"])
def test_articulation_fixtures(name):
    _check(FIXTURE_EDGES[name])


def test_articulation_chain_and_star():
    # chain 0-1-2-3-4: inner vertices are articulation; star: center only
    _check([(0, 1), (1, 2), (2, 3), (3, 4)])
    _check([(10, 11), (10, 12), (10, 13), (10, 14)])


def test_articulation_random_graphs_vs_tarjan():
    rng = np.random.default_rng(5)
    for trial in range(10):
        n = int(rng.integers(8, 60))
        m = int(rng.integers(n - 1, 3 * n))
        edges = set()
        # random tree backbone + extra random edges (connected-ish,
        # multiple components across trials via random pruning)
        for v in range(1, n):
            if rng.random() < 0.9:
                edges.add((int(rng.integers(0, v)), v))
        for _ in range(m):
            a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
            if a != b:
                edges.add((min(a, b), max(a, b)))
        if edges:
            _check(sorted(edges))


def tarjan_bccs(n_nodes: set, edges: list) -> set:
    """Edge-stack Tarjan: biconnected components as a set of frozensets
    of canonical edges."""
    adj: dict = {v: [] for v in n_nodes}
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    disc, low, parent = {}, {}, {}
    visited = set()
    estack: list = []
    bccs = []
    timer = [0]
    for root in sorted(n_nodes):
        if root in visited:
            continue
        stack = [(root, iter(adj[root]))]
        visited.add(root)
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        while stack:
            v, it = stack[-1]
            advanced = False
            for w in it:
                if w not in visited:
                    visited.add(w)
                    parent[w] = v
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    estack.append((min(v, w), max(v, w)))
                    stack.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w != parent.get(v) and disc[w] < disc[v]:
                    estack.append((min(v, w), max(v, w)))
                    low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[v])
                    if low[v] >= disc[p]:
                        comp = set()
                        edge = (min(p, v), max(p, v))
                        while estack:
                            e = estack.pop()
                            comp.add(e)
                            if e == edge:
                                break
                        if comp:
                            bccs.append(frozenset(comp))
        if estack:
            bccs.append(frozenset(estack))
            estack.clear()
    return set(bccs)


def test_bcc_partition_vs_tarjan():
    import ray.data
    import pyarrow as pa

    from centrality_gpu_ray.pipelines.bicc import bcc_labels

    rng = np.random.default_rng(9)
    for trial in range(6):
        n = int(rng.integers(8, 50))
        edges = set()
        for v in range(1, n):
            if rng.random() < 0.9:
                edges.add((int(rng.integers(0, v)), v))
        for _ in range(2 * n):
            a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
            if a != b:
                edges.add((min(a, b), max(a, b)))
        edges = sorted(edges)
        nodes = {u for u, _ in edges} | {v for _, v in edges}
        tbl = pa.table({
            "src": pa.array([u for u, _ in edges], type=pa.int64()),
            "dst": pa.array([v for _, v in edges], type=pa.int64()),
            "weight": pa.array([1] * len(edges), type=pa.int64()),
        })
        g = Graph(ray.data.from_arrow(tbl))
        out = bcc_labels(g).to_pandas()
        got = {frozenset(map(tuple, grp[["src", "dst"]].values.tolist()))
               for _, grp in out.groupby("bcc")}
        want = tarjan_bccs(nodes, edges)
        assert got == want, (trial, len(got), len(want))


def test_bridges_vs_brute_force():
    from centrality_gpu_ray.pipelines.bicc import bridges

    for name in ["test1", "test2", "test4", "test5"]:
        g = Graph(fixture_dataset(name))
        t = bridges(g).to_pandas()
        s, d, _ = g.local_arrays()
        ids = g.node_ids
        edges = list(zip(ids[s], ids[d]))

        def n_reachable(adj, start):
            seen = {start}
            stack = [start]
            while stack:
                u = stack.pop()
                for w in adj.get(u, ()):
                    if w not in seen:
                        seen.add(w)
                        stack.append(w)
            return seen

        def build_adj(skip):
            adj = {}
            for e in edges:
                if e == skip:
                    continue
                adj.setdefault(e[0], set()).add(e[1])
                adj.setdefault(e[1], set()).add(e[0])
            return adj

        base_adj = build_adj(None)
        for row in t.itertuples():
            e = (row.src, row.dst)
            before = n_reachable(base_adj, row.src)
            after = n_reachable(build_adj(e), row.src)
            expect = len(after) < len(before)
            assert bool(row.is_bridge) == expect, (name, e)
