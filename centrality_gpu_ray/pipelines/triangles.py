"""Triangle counting by degree-ordered orientation + wedge semi-join.

The reference's skew answer was whole-graph decomposition; ours (per
SURVEY.md §4 and the north_rule) is the classic degree-ordered
orientation: direct each undirected edge ``u→v`` iff
``(deg(u), u) < (deg(v), v)``. Every triangle then has exactly one
*apex* vertex with two out-edges, out-degrees are bounded by O(√m), and
wedge generation skew is capped.

Pipeline: oriented edges → wedges (all out-neighbor pairs per apex) →
semi-join wedges against the oriented edge set on the closing pair →
per-vertex credit (each matched wedge gives apex and both endpoints one
triangle). Local mode does the join with ``np.isin`` on packed u64 keys
(the same packing trick as ``bcc_bfs.cpp:1001-1003``); distributed mode
uses a broadcast packed-key set when the edge set is small and a
hash-partitioned ``Dataset.join`` on ``(b, c)`` beyond that.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.graph import Graph

BROADCAST_EDGE_LIMIT = 50_000_000  # packed u64 keys ≤ 400 MB broadcast


def _orient(s: np.ndarray, d: np.ndarray, deg: np.ndarray):
    """Canonical edges → oriented (a, b) with (deg, id) order."""
    swap = (deg[d] < deg[s]) | ((deg[d] == deg[s]) & (d < s))
    a = np.where(swap, d, s)
    b = np.where(swap, s, d)
    return a, b


def _wedges_from_adj(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, ...]:
    """All out-neighbor pairs per apex. `a` sorted; returns (apex, x, y)
    with (x, y) in orientation order (x before y in b-sorted-by-(deg,id)
    terms is not required — we canonicalize by value below after packing
    with deg-order ids, so pairs are emitted with x<y by *oriented rank*).
    """
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    starts = np.flatnonzero(np.r_[True, a_s[1:] != a_s[:-1]])
    counts = np.diff(np.r_[starts, a_s.size])
    apex_list, x_list, y_list = [], [], []
    for st, c in zip(starts, counts):
        if c < 2:
            continue
        nbrs = b_s[st:st + c]
        iu, ju = np.triu_indices(c, k=1)
        apex_list.append(np.full(iu.size, a_s[st], dtype=np.int64))
        x_list.append(nbrs[iu])
        y_list.append(nbrs[ju])
    if not apex_list:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return (np.concatenate(apex_list), np.concatenate(x_list),
            np.concatenate(y_list))


def triangle_counts(graph: Graph, config: EngineConfig | None = None,
                    metrics: dict | None = None) -> pa.Table:
    """Returns ``(node, triangles)`` per-vertex counts (vertices with 0
    included). Total = sum/3 · 3 = matched wedges."""
    cfg = config or graph.config
    t0 = time.perf_counter()
    deg = graph.out_degree
    if graph.mode == "local":
        s, d, _ = graph.local_arrays()
        a, b = _orient(s, d, deg)
        tri = _count_local(graph, a, b)
    else:
        tri = _count_distributed(graph, cfg, deg)
    elapsed = time.perf_counter() - t0
    if metrics is not None:
        metrics.update({
            "sec": elapsed,
            "total_triangles": int(tri.sum() // 3),
            "mode": graph.mode,
        })
    return pa.table({
        "node": pa.array(graph.node_ids, type=pa.int64()),
        "triangles": pa.array(tri.astype(np.int64)),
    })


def _pack(x: np.ndarray, y: np.ndarray, n: int) -> np.ndarray:
    lo = np.minimum(x, y)
    hi = np.maximum(x, y)
    return lo * np.int64(n) + hi


def _count_local(graph: Graph, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    n = graph.num_vertices
    apex, x, y = _wedges_from_adj(a, b)
    edge_keys = np.sort(_pack(a, b, n))
    wedge_keys = _pack(x, y, n)
    idx = np.searchsorted(edge_keys, wedge_keys)
    idx = np.minimum(idx, edge_keys.size - 1)
    hit = edge_keys.size > 0
    match = (edge_keys[idx] == wedge_keys) if hit else np.zeros(0, dtype=bool)
    tri = np.zeros(n, dtype=np.int64)
    for arr in (apex[match], x[match], y[match]):
        np.add.at(tri, arr, 1)
    return tri


def _wedge_gen(group: pa.Table) -> pa.Table:
    """map_groups fn over per-apex groups → wedge rows."""
    a = group.column("a").to_numpy()
    b = group.column("b").to_numpy()
    apex, x, y = _wedges_from_adj(a, b)
    return pa.table({"apex": pa.array(apex), "x": pa.array(x), "y": pa.array(y)})


class _WedgeMatch:
    """Broadcast-join stage: filter wedges whose (x, y) closes an edge."""

    def __init__(self, keys_ref, n: int):
        self._keys_ref = keys_ref
        self._keys = None
        self._n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._keys is None:
            self._keys = ray.get(self._keys_ref)
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        wk = _pack(x, y, self._n)
        if self._keys.size == 0:
            return batch.slice(0, 0)
        idx = np.minimum(np.searchsorted(self._keys, wk), self._keys.size - 1)
        match = self._keys[idx] == wk
        return batch.filter(pa.array(match))


def _count_distributed(graph: Graph, cfg: EngineConfig, deg: np.ndarray) -> np.ndarray:
    import ray

    n = graph.num_vertices
    deg_ref = ray.put(deg)

    def orient_batch(batch: pa.Table, _deg_ref=deg_ref) -> pa.Table:
        dg = ray.get(_deg_ref)
        s = batch.column("s").to_numpy()
        d = batch.column("d").to_numpy()
        a, b = _orient(s, d, dg)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    oriented = graph.edges.map_batches(orient_batch, batch_format="pyarrow",
                                       batch_size=cfg.batch_size).materialize()
    # Wedge generation needs each apex's full out-neighborhood co-located:
    # one hash-shuffle on the apex, then per-group pair expansion.
    wedges = oriented.groupby("a").map_groups(_wedge_gen, batch_format="pyarrow")

    if graph.num_edges <= BROADCAST_EDGE_LIMIT:
        # Semi-join via broadcast sorted packed-key set (one object-store
        # copy per node, searchsorted per batch).
        tbl = pa.concat_tables(list(oriented.iter_batches(batch_size=None,
                                                          batch_format="pyarrow")))
        keys = np.sort(_pack(tbl.column("a").to_numpy(),
                             tbl.column("b").to_numpy(), n))
        keys_ref = ray.put(keys)
        matched = wedges.map_batches(_WedgeMatch(keys_ref, n), batch_format="pyarrow")
    else:
        # Scale path: hash-partitioned join on the closing pair.
        closing = oriented.rename_columns({"a": "x", "b": "y"})
        matched = wedges.join(closing, join_type="inner", on=("x", "y"),
                              num_partitions=cfg.num_partitions)

    tri = np.zeros(n, dtype=np.int64)
    counted = matched.map_batches(_wedge_credit, batch_format="pyarrow")
    for batch in counted.iter_batches(batch_size=None, batch_format="pyarrow"):
        np.add.at(tri, batch.column("v").to_numpy(),
                  batch.column("c").to_numpy())
    return tri


def _wedge_credit(batch: pa.Table) -> pa.Table:
    v = np.concatenate([batch.column("apex").to_numpy(),
                        batch.column("x").to_numpy(),
                        batch.column("y").to_numpy()])
    uniq, cnt = np.unique(v, return_counts=True)
    return pa.table({"v": pa.array(uniq), "c": pa.array(cnt.astype(np.int64))})
