"""Degree machinery (M3 / A2).

The reference tallies per-vertex degrees and a deg-0/1/2/>2 histogram
while building its adjacency (``graph.cpp:47-69``,
``graph_ear_decompos.h:54-129``) and picks the max-degree vertex as the
BFS root (``bcc_bfs.cpp:271``). Here: one groupby over the symmetric
edge table, pre-aggregated per batch so the shuffle carries at most one
row per (vertex, block).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _local_degree(batch: pa.Table) -> pa.Table:
    out = batch.select(["src"]).group_by(["src"]).aggregate([([], "count_all")])
    # select by name — pyarrow group_by column order is version-dependent
    return pa.table({"node": out.column("src"),
                     "degree": out.column("count_all")}).cast(
        pa.schema([("node", pa.int64()), ("degree", pa.int64())]))


def degrees(edges_ds):
    """Per-vertex degree of the symmetric edge table → (node, degree)."""
    from centrality_gpu_ray.stages.shuffle import hash_aggregate

    pre = edges_ds.map_batches(_local_degree, batch_format="pyarrow")
    return hash_aggregate(pre, ["node"], [("degree", "sum")])


def degree_histogram(edges_ds):
    """(degree, num_nodes) histogram — the A2/A3 run-length pattern
    (``bicc.cpp:61-77``) as two cascaded grouped counts."""
    import pyarrow as pa

    from centrality_gpu_ray.stages.shuffle import hash_aggregate

    deg = degrees(edges_ds)
    pre = deg.map_batches(
        lambda t: (lambda o: pa.table({"degree": o.column("degree"),
                                       "num_nodes": o.column("count_all")}))(
            t.group_by(["degree"]).aggregate([([], "count_all")])),
        batch_format="pyarrow")
    out = hash_aggregate(pre, ["degree"], [("num_nodes", "sum")],
                         num_partitions=4)
    return out.sort("degree")


def max_degree_vertex(edges_ds) -> tuple[int, int]:
    """(vertex, degree) with max degree; ties broken by min vertex id —
    deterministic, unlike the reference's scan order (A2)."""
    deg = degrees(edges_ds)
    top = deg.sort(["degree", "node"], descending=[True, False]).limit(1).take_all()
    row = top[0]
    return int(row["node"]), int(row["degree"])


def degrees_dense(src: np.ndarray, num_vertices: int) -> np.ndarray:
    """Dense in-memory degree vector (driver fast path for fixture-scale
    graphs): bincount over the symmetric src column."""
    return np.bincount(src, minlength=num_vertices).astype(np.int64)
