"""Iterative degree peeling: pendant pruning (M5) and k-core.

The reference's ``PendantGraph`` peels degree≤1 vertices for up to 5
rounds, recording the removal round and the surviving parent
(``pendant_graph.cpp:9-58``; disabled at ``main.cpp:65`` but live code).
Generalized here to k-core peeling: each round removes vertices whose
*current* degree < k — one degree groupby + one broadcast filter per
round, on a shrinking edge Dataset.

Returns ``(node, round_removed)`` with −1 for survivors (the k-core),
plus the surviving edge Dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.pipelines.graph import Graph


def peel(graph: Graph, k: int = 2, max_rounds: int | None = None):
    """Peel vertices with degree < k iteratively.

    ``k=2`` = pendant pruning (reference semantics, default 5 rounds
    there; unbounded here unless ``max_rounds``). Local-kernel on the
    driver-held canonical arrays in local mode; in distributed mode each
    round recomputes degrees via the pre-aggregated groupby and filters
    edge blocks against the broadcast removed-set.
    """
    import ray

    graph.require_dense("peel")
    n = graph.num_vertices
    removed_round = np.full(n, -1, dtype=np.int64)
    s, d, _ = graph.local_arrays() if graph.mode == "local" else (None, None, None)

    if graph.mode != "local":
        # distributed: iterate on the materialized edge Dataset
        return _peel_distributed(graph, k, max_rounds)

    alive_edge = np.ones(s.size, dtype=bool)
    rnd = 0
    while max_rounds is None or rnd < max_rounds:
        deg = (np.bincount(s[alive_edge], minlength=n)
               + np.bincount(d[alive_edge], minlength=n))
        doomed = (deg < k) & (deg > 0) & (removed_round == -1)
        # also isolated vertices never seen in surviving edges
        if rnd == 0:
            isolated = (deg == 0) & (removed_round == -1)
            removed_round[isolated] = 0 if k > 0 else -1
        if not doomed.any():
            break
        removed_round[doomed] = rnd
        alive_edge &= ~(doomed[s] | doomed[d])
        rnd += 1

    table = pa.table({
        "node": pa.array(graph.node_ids, type=pa.int64()),
        "round_removed": pa.array(removed_round),
    })
    core_edges = pa.table({
        "src": pa.array(graph.node_ids[s[alive_edge]]),
        "dst": pa.array(graph.node_ids[d[alive_edge]]),
    })
    return table, core_edges


def _peel_distributed(graph: Graph, k: int, max_rounds: int | None):
    import ray
    from ray.data.aggregate import Sum

    from centrality_gpu_ray.pipelines.graph import _degree_partial

    n = graph.num_vertices
    removed_round = np.full(n, -1, dtype=np.int64)
    edges = graph.edges
    rnd = 0
    while max_rounds is None or rnd < max_rounds:
        deg = np.zeros(n, dtype=np.int64)
        for part in edges.map_batches(_degree_partial, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            np.add.at(deg, part.column("v").to_numpy(), part.column("c").to_numpy())
        doomed = (deg < k) & (deg > 0) & (removed_round == -1)
        if not doomed.any():
            break
        removed_round[doomed] = rnd
        doomed_ref = ray.put(removed_round >= 0)

        def drop(batch: pa.Table, _ref=doomed_ref) -> pa.Table:
            gone = ray.get(_ref)
            s = batch.column("s").to_numpy()
            d = batch.column("d").to_numpy()
            return batch.filter(pa.array(~(gone[s] | gone[d])))

        edges = edges.map_batches(drop, batch_format="pyarrow").materialize()
        rnd += 1

    table = pa.table({
        "node": pa.array(graph.node_ids, type=pa.int64()),
        "round_removed": pa.array(removed_round),
    })
    parts = list(edges.iter_batches(batch_size=None, batch_format="pyarrow"))
    core = pa.concat_tables(parts) if parts else pa.table(
        {"s": pa.array([], pa.int64()), "d": pa.array([], pa.int64()),
         "w": pa.array([], pa.int64())})
    core_edges = pa.table({
        "src": pa.array(graph.node_ids[core.column("s").to_numpy()]
                        if core.num_rows else np.empty(0, np.int64)),
        "dst": pa.array(graph.node_ids[core.column("d").to_numpy()]
                        if core.num_rows else np.empty(0, np.int64)),
    })
    return table, core_edges


def pendant_prune(graph: Graph, max_rounds: int = 5):
    """Reference-shaped pendant peel (degree ≤ 1, bounded rounds)."""
    return peel(graph, k=2, max_rounds=max_rounds)
