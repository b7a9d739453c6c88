"""Louvain at scale — `louvain_coarse` over a 6M-vertex planted
community graph (240k ring-linked 25-cliques), fully SHARDED input.

The LP pre-clustering collapses each clique (LP's fixpoint on a
clique is its min id), the distributed contraction produces a ~240k
vertex super-graph, the exact kernel optimizes it, and the final
communities broadcast back. Checks: every planted clique stays in ONE
community (exact, all 240k), final Q > 0.99, and the metrics Q equals
the distributed modularity scorer's value.

Run: python scripts/demo_louvain_6m.py [num_cliques] (owns its Ray
session; defaults 240,000 cliques × 25 = 6M vertices).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RAY_worker_niceness", "0")

SZ = 25
BLOCK = 10_000  # cliques per synth task


def main() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from centrality_gpu_ray.config import EngineConfig
    from centrality_gpu_ray.pipelines.community import (community_stats,
                                                        modularity_score)
    from centrality_gpu_ray.pipelines.graph import Graph
    from centrality_gpu_ray.pipelines.louvain import louvain_coarse

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    N = K * SZ
    out: dict = {"num_cliques": K, "clique_size": SZ,
                 "num_vertices": N}

    @ray.remote
    def blk(c0: int, c1: int) -> pa.Table:
        i, j = np.triu_indices(SZ, k=1)
        srcs, dsts = [], []
        for c in range(c0, c1):
            srcs.append(c * SZ + i)
            dsts.append(c * SZ + j)
        cc = np.arange(c0, c1)
        srcs.append(cc * SZ)
        dsts.append(((cc + 1) % K) * SZ)
        return pa.table({
            "src": pa.array(np.concatenate(srcs).astype(np.int64)),
            "dst": pa.array(np.concatenate(dsts).astype(np.int64))})

    edges = ray.data.from_arrow_refs(
        [blk.remote(c, min(c + BLOCK, K)) for c in range(0, K, BLOCK)])
    t0 = time.perf_counter()
    g = Graph(edges, config=EngineConfig(
        dense_vertex_limit=min(5_000_000, N - 1)))
    out["build_sec"] = round(time.perf_counter() - t0, 2)
    out["num_edges"] = g.num_edges
    assert g.sharded

    m: dict = {}
    t0 = time.perf_counter()
    comm = louvain_coarse(g, metrics=m).materialize()
    out["louvain_sec"] = round(time.perf_counter() - t0, 2)
    out["metrics"] = {k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in m.items()}

    # exact planted check, distributed: a clique is intact iff its 25
    # members share one community — count distinct (clique, community)
    # pairs; must equal #cliques with full coverage
    from centrality_gpu_ray.stages.shuffle import hash_aggregate

    def pairs(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy()
        cm = t.column("community").to_numpy()
        key = (node // SZ) * np.int64(1 << 32) + (cm % np.int64(1 << 32))
        uniq = np.unique(key)
        return pa.table({"k": pa.array(uniq),
                         "one": pa.array(np.ones(uniq.size,
                                                 dtype=np.int64))})

    distinct = hash_aggregate(
        comm.map_batches(pairs, batch_format="pyarrow"),
        keys=["k"], aggs=[("one", "min")], num_partitions=16).count()
    out["distinct_clique_community_pairs"] = int(distinct)
    assert distinct == K, \
        f"{distinct - K} cliques split across communities"
    assert comm.count() == N

    q = modularity_score(community_stats(
        g.canonical_edges(),
        comm.map_batches(
            lambda t: t.rename_columns(["node", "label"]),
            batch_format="pyarrow")))
    out["q_scored"] = round(q["q_micro"] / 1e6, 4)
    assert q["q_micro"] / 1e6 > 0.99
    assert abs(q["q_micro"] / 1e6 - m["modularity"]) < 1e-4
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
