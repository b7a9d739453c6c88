"""k-truss decomposition — iterative peel of edges by triangle support.

The edge-level analog of the vertex k-core peel (``pipelines/peel.py``,
reference M5 ``pendant_graph.cpp``): each round removes every surviving
edge whose triangle support (count of triangles containing it, see
``triangles.py::edge_support``) is below ``k − 2``; removing edges
destroys triangles, so rounds repeat until a fixpoint. The surviving
edge set is the k-truss — the standard cohesive-subgraph operator the
reference approximates with its BCC/ear cascade.

Scale shape: the triangle orientation uses the ORIGINAL (degree, id)
total order throughout — correctness of once-per-triangle counting
needs only a fixed total order, so per-round degree recomputation (a
shuffle) is avoided. Per round: one apex-hash wedge generation + one
packed-key semi-join + one count aggregate over the *surviving* edges
(the set shrinks monotonically), all via the explicit hash-shuffle
primitives; the driver sees only O(1) scalars per round (the doomed
count). Output: ``(src, dst, round_removed)`` with −1 for edges in the
k-truss, mirroring the k-core query shape.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.graph import Graph
from centrality_gpu_ray.pipelines.triangles import _orient, _pack, _wedges_from_adj  # noqa: F401


def _support_for_alive(a: np.ndarray, b: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(sorted packed keys of the alive oriented edges, support per key)."""
    keys_sorted = np.sort(_pack(a, b, n))
    support = np.zeros(keys_sorted.size, dtype=np.int64)
    apex, x, y = _wedges_from_adj(a, b)
    if apex.size and keys_sorted.size:
        wk = _pack(x, y, n)
        idx = np.minimum(np.searchsorted(keys_sorted, wk), keys_sorted.size - 1)
        match = keys_sorted[idx] == wk
        am, xm, ym = apex[match], x[match], y[match]
        keys3 = np.concatenate([_pack(am, xm, n), _pack(am, ym, n), wk[match]])
        uniq, cnt = np.unique(keys3, return_counts=True)
        support[np.searchsorted(keys_sorted, uniq)] = cnt
    return keys_sorted, support


def ktruss(graph: Graph, k: int = 4, config: EngineConfig | None = None,
           metrics: dict | None = None):
    """Returns ``(src, dst, round_removed)`` per canonical edge
    (original ids); −1 = the edge survives in the k-truss."""
    cfg = config or graph.config
    t0 = time.perf_counter()
    n = graph.num_vertices
    thresh = k - 2

    if not getattr(graph, "sharded", False) and graph.mode == "local":
        deg = graph.out_degree
        s, d, _ = graph.local_arrays()
        a, b = _orient(s, d, deg)
        m = a.size
        order = np.argsort(_pack(a, b, n))  # edge index by packed key
        alive = np.ones(m, dtype=bool)
        round_removed = np.full(m, -1, dtype=np.int64)
        rounds = 0
        while rounds < cfg.max_supersteps:
            ai = np.flatnonzero(alive)
            keys_sorted, support = _support_for_alive(a[ai], b[ai], n)
            doomed_local = support < thresh
            if not doomed_local.any():
                break
            # keys_sorted is the sorted packed keys of alive edges; map
            # back to edge indices through the global packed-key order
            alive_sorted_idx = order[alive[order]]
            doomed_idx = alive_sorted_idx[doomed_local]
            round_removed[doomed_idx] = rounds
            alive[doomed_idx] = False
            rounds += 1
        if metrics is not None:
            metrics.update({"sec": time.perf_counter() - t0, "rounds": rounds,
                            "in_truss": int(alive.sum()), "mode": "local"})
        return pa.table({
            "src": pa.array(graph.node_ids[s], type=pa.int64()),
            "dst": pa.array(graph.node_ids[d], type=pa.int64()),
            "round_removed": pa.array(round_removed),
        })

    return _ktruss_distributed(graph, thresh, cfg, t0, metrics)


def _ktruss_distributed(graph: Graph, thresh: int, cfg: EngineConfig,
                        t0: float, metrics: dict | None):
    """Dataset-shaped rounds: edges stay distributed; per round one
    wedge shuffle + one support aggregate + a filter; doomed edges are
    unioned into the result lazily. Driver work per round: two scalar
    counts."""
    from centrality_gpu_ray.pipelines.triangles import (_support_counts_ds,
                                                        original_ids_mapper,
                                                        oriented_edges_ds)
    from centrality_gpu_ray.stages.shuffle import hash_lookup_join

    n = graph.num_vertices
    P = cfg.num_partitions
    to_orig = original_ids_mapper(graph)

    cur = oriented_edges_ds(graph, cfg)
    doomed_parts: list = []
    rounds = 0
    while rounds < cfg.max_supersteps:
        sup = _support_counts_ds(cur, n, cfg)
        with_sup = hash_lookup_join(cur.map_batches(
            lambda t: pa.table({"key": pa.array(
                _pack(t.column("a").to_numpy(), t.column("b").to_numpy(), n)),
                "a": t.column("a"), "b": t.column("b")}),
            batch_format="pyarrow"), sup, "key", "key", {"c": "sup"},
            num_partitions=P, outer_fill={"sup": 0}).materialize()

        r = rounds  # bind per-round constant for the closure

        def split_doomed(t: pa.Table, _r=r) -> pa.Table:
            supv = t.column("sup").to_numpy(zero_copy_only=False)
            mask = pa.array(supv < thresh)
            doomed = t.filter(mask)
            return pa.table({"a": doomed.column("a"), "b": doomed.column("b"),
                             "round_removed": pa.array(
                                 np.full(doomed.num_rows, _r, dtype=np.int64))})

        doomed_ds = with_sup.map_batches(split_doomed,
                                         batch_format="pyarrow").materialize()
        n_doomed = doomed_ds.count()
        if n_doomed == 0:
            break
        doomed_parts.append(doomed_ds)
        cur = with_sup.map_batches(
            lambda t: t.filter(pa.array(
                t.column("sup").to_numpy(zero_copy_only=False) >= thresh))
            .select(["a", "b"]),
            batch_format="pyarrow").materialize()
        rounds += 1

    survivors = cur.map_batches(
        lambda t: pa.table({"a": t.column("a"), "b": t.column("b"),
                            "round_removed": pa.array(
                                np.full(t.num_rows, -1, dtype=np.int64))}),
        batch_format="pyarrow")
    out = survivors
    for part in doomed_parts:
        out = out.union(part)

    def finish(t: pa.Table, _to_orig=to_orig) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table({"src": pa.array(_to_orig(lo), type=pa.int64()),
                         "dst": pa.array(_to_orig(hi), type=pa.int64()),
                         "round_removed": t.column("round_removed")})

    out = out.map_batches(finish, batch_format="pyarrow")
    if metrics is not None:
        metrics.update({"sec": time.perf_counter() - t0, "rounds": rounds,
                        "mode": graph.mode})
    return out
