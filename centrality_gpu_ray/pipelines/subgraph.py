"""Induced-subgraph extraction — the composition glue between the
set-producing operators (communities, neighbor_sample frontiers, MIS,
top-k results) and every graph pipeline: carve the vertex set's
induced edges out of a (possibly sharded) graph and rebuild a Graph
over them.

Two regimes, chosen by the node-set size:

* small sets (≤ ``broadcast_limit``): ONE ``ray.put`` of the sorted id
  array + a stateless membership filter per batch — no shuffle;
* large sets: two hash-partitioned semi-joins on the endpoints (the
  engine's standard co-partitioned membership exchange) — the node
  population never lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.graph import Graph

__all__ = ["induced_subgraph"]

_BROADCAST_LIMIT = 5_000_000  # ids ≤ this broadcast as one array


def induced_subgraph(graph: Graph, nodes, config: EngineConfig | None = None,
                     mode: str = "auto",
                     broadcast_limit: int = _BROADCAST_LIMIT) -> Graph:
    """New :class:`Graph` over the edges whose BOTH endpoints are in
    ``nodes`` (original ids — an array, list, or a Dataset/table with
    a ``node`` column). Vertices of ``nodes`` with no induced edge
    drop out (a Graph's vertex set is its edge endpoints)."""
    import ray

    cfg = config or graph.config
    edges = graph.canonical_edges()
    if isinstance(nodes, pa.Table):
        nodes = nodes.column("node").to_numpy(zero_copy_only=False)
    if isinstance(nodes, (list, tuple, set, np.ndarray)):
        ids = np.unique(np.asarray(list(nodes)
                                   if isinstance(nodes, (set,))
                                   else nodes, dtype=np.int64))
        if ids.size > broadcast_limit:
            import ray.data
            nodes = ray.data.from_arrow(pa.table({
                "node": pa.array(ids, type=pa.int64())}))
        else:
            ref = ray.put(ids)

            def member(t: pa.Table, _r=ref) -> pa.Table:
                m = ray.get(_r)
                s = t.column("src").to_numpy()
                d = t.column("dst").to_numpy()
                ps = np.searchsorted(m, s)
                pd_ = np.searchsorted(m, d)
                ps = np.minimum(ps, m.size - 1)
                pd_ = np.minimum(pd_, m.size - 1)
                keep = (m[ps] == s) & (m[pd_] == d) if m.size else \
                    np.zeros(len(t), dtype=bool)
                return t.filter(pa.array(keep))

            sub = edges.map_batches(member, batch_format="pyarrow",
                                    batch_size=cfg.batch_size)
            return Graph(sub, config=cfg, normalized=True, mode=mode)
    # Dataset node set: co-partitioned membership, never driver-sized
    from centrality_gpu_ray.stages.shuffle import hash_semi_join

    nodes = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node").cast(pa.int64())}),
        batch_format="pyarrow")
    # hash_semi_join joins on a shared column name: mirror the tested
    # endpoint under "node" per side
    with_src = hash_semi_join(
        edges.map_batches(lambda t: t.append_column(
            "node", t.column("src")), batch_format="pyarrow"),
        nodes, on="node", num_partitions=cfg.num_partitions)
    both = hash_semi_join(
        with_src.map_batches(lambda t: t.drop_columns(["node"])
                             .append_column("node", t.column("dst")),
                             batch_format="pyarrow"),
        nodes, on="node", num_partitions=cfg.num_partitions)
    sub = both.map_batches(lambda t: t.drop_columns(["node"]),
                           batch_format="pyarrow")
    return Graph(sub, config=cfg, normalized=True, mode=mode)
