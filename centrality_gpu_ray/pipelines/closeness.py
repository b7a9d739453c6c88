"""Closeness / harmonic centrality from a deterministic source sample.

The reference's decomposition exists to make exact all-sources
traversal feasible on a GPU (``begin_gpupgm.cu:42-67`` launches one
persistent kernel over a work-stealing source queue); the standard
large-graph practice — and the only one that scales to a 10^12-vertex
corpus — is sampled closeness: run k independent BFS traversals from a
deterministic source set (k ≪ n) and report per-source distance
aggregates. Each BFS is itself the fully distributed superstep
operator (``pipelines/bfs.py``, dense or sharded-state), so the
operator inherits the engine's scale path; the k-loop is driver-side
but O(k), not O(n).

Integer-exact outputs so the driver can value-hash against a
multi-source chained-rounds SQL oracle:

- ``n_reached``  — vertices at finite distance (incl. the source)
- ``dist_sum``   — Σ d(s, v) over reached v (closeness =
  (n_reached−1)/dist_sum, derivable exactly)
- ``ecc``        — max finite distance (source eccentricity; the
  sampled-diameter sketch A6 reads max/median of this column)
- ``harmonic_micro`` — Σ_{d>0} floor(1e6/d + 0.5): micro-unit harmonic
  centrality with half-up rounding per term (identical IEEE division
  and floor on both engine and SQL sides → bit-stable)
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.bfs import bfs
from centrality_gpu_ray.pipelines.graph import Graph


def _level_aggregates(levels: np.ndarray) -> tuple[int, int, int, int]:
    reached = levels >= 0
    pos = levels[levels > 0].astype(np.float64)
    harmonic = np.floor(1e6 / pos + 0.5).astype(np.int64).sum() if pos.size else 0
    ecc = int(levels[reached].max()) if reached.any() else 0
    return int(reached.sum()), int(levels[reached].sum()), int(harmonic), ecc


def closeness_from_sources(graph: Graph, sources, config: EngineConfig | None = None,
                           metrics: dict | None = None,
                           weighted: bool = False) -> pa.Table:
    """``(source, n_reached, dist_sum, harmonic_micro, ecc)`` for each
    source (original node ids), one distributed traversal per source —
    unit-distance BFS by default, min-plus SSSP (``pipelines/sssp.py``)
    with ``weighted=True`` (integer edge weights → exact integer
    distance aggregates either way)."""
    from centrality_gpu_ray.pipelines.sssp import sssp

    cfg = config or graph.config
    col = "distance" if weighted else "level"
    t0 = time.perf_counter()
    rows = {"source": [], "n_reached": [], "dist_sum": [],
            "harmonic_micro": [], "ecc": []}
    depths = []
    for s in sources:
        m: dict = {}
        if weighted:
            out = sssp(graph, int(s), config=cfg, metrics=m)
        else:
            out = bfs(graph, int(s), config=cfg, metrics=m)
        depths.append(m.get("depth", m.get("supersteps", -1)))
        if isinstance(out, pa.Table):
            levels = out.column(col).to_numpy()
            n_reached, dist_sum, harmonic, ecc = _level_aggregates(levels)
        else:
            # sharded path: Dataset of (node, level, ...) — reduce to three
            # scalars via per-block partials; driver sums O(blocks) rows
            n_reached = dist_sum = harmonic = ecc = 0
            for b in out.map_batches(
                    lambda t, _c=col: pa.table({"p": pa.array(
                        [list(_level_aggregates(t.column(_c).to_numpy()))],
                        type=pa.list_(pa.int64()))}),
                    batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
                for part in b.column("p").to_pylist():
                    n_reached += part[0]
                    dist_sum += part[1]
                    harmonic += part[2]
                    ecc = max(ecc, part[3])
        rows["source"].append(int(s))
        rows["n_reached"].append(n_reached)
        rows["dist_sum"].append(dist_sum)
        rows["harmonic_micro"].append(harmonic)
        rows["ecc"].append(ecc)
    if metrics is not None:
        metrics.update({"sec": time.perf_counter() - t0,
                        "sources": len(rows["source"]),
                        "max_depth": max(depths, default=-1)})
    return pa.table({k: pa.array(v, type=pa.int64()) for k, v in rows.items()})
