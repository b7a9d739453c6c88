"""Symmetry-breaking operators at scale — MIS + Jones–Plassmann
coloring over a 6M-vertex / 12M-edge ring+chord graph (the
demo_sharded_6m topology), with EXACT distributed verification.

Both operators run the OWNER-RESIDENT sharded path (the default
``dense_vertex_limit`` stays at 5M — nothing is raised): the vertex
dictionary is built distributed, priorities/counters/color-sets live
in the shard-pool owners, and each round ships only the newly-decided
vertices (total message volume O(m) over all rounds). Correctness is
then checked the scale-honest way: one map_batches pass over the edge
Dataset counts MIS independence violations and coloring properness
violations exactly (must be 0).

Run: python scripts/demo_symmetry_6m.py [num_vertices] (owns its Ray
session; defaults 6,000,000 / 32 CPUs via RAY_GRAFT_CPUS).
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

BLOCK = 500_000


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
    from centrality_gpu_ray.pipelines.coloring import greedy_coloring
    from centrality_gpu_ray.pipelines.graph import Graph
    from centrality_gpu_ray.pipelines.mis import maximal_independent_set

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    out: dict = {"num_vertices_target": N}

    @ray.remote
    def edge_block(lo: int, hi: int) -> pa.Table:
        i = np.arange(lo, hi, dtype=np.int64)
        src = np.concatenate([i, i])
        dst = np.concatenate([(i + 1) % N, (i * i + 3) % N])
        return pa.table({
            "src": pa.array(src * 13 + 5),
            "dst": pa.array(dst * 13 + 5),
            "weight": pa.array(np.ones(src.size, dtype=np.int64)),
        })

    edges = ray.data.from_arrow_refs(
        [edge_block.remote(lo, min(lo + BLOCK, N))
         for lo in range(0, N, BLOCK)])
    # default dense_vertex_limit (5M) at full scale — the
    # per-block-unique upper bound exceeds it, so the graph builds
    # SHARDED and MIS/coloring run the owner-resident Jones–Plassmann
    # machinery (smaller smoke-run N lowers the limit to stay sharded)
    cfg = EngineConfig(dense_vertex_limit=min(5_000_000, N - 1))
    t0 = time.perf_counter()
    g = Graph(edges, config=cfg, mode="distributed")
    out["build_sec"] = round(time.perf_counter() - t0, 3)
    out["num_edges"] = g.num_edges
    out["sharded"] = bool(g.sharded)
    assert g.sharded, "demo expects the sharded path at this scale"

    # ---- MIS (owner-resident sharded rounds) ----
    m_mis: dict = {}
    mis_ds = maximal_independent_set(g, seed=0, config=cfg,
                                     metrics=m_mis)
    assert m_mis["mode"] == "sharded"
    mis_pdf = mis_ds.to_pandas()
    out["mis"] = {k: (round(v, 3) if isinstance(v, float) else v)
                  for k, v in m_mis.items()}

    # exact distributed verification: in_mis in DENSE id space (dense
    # id = rank of original id — identical to the vdict's ordering)
    node = mis_pdf["node"].to_numpy()
    dense_idx = np.searchsorted(np.sort(node), node)
    in_mis = np.zeros(g.num_vertices, dtype=bool)
    in_mis[dense_idx] = mis_pdf["in_mis"].to_numpy()
    ref = ray.put(in_mis)

    def mis_violations(t: pa.Table, _r=ref) -> pa.Table:
        import ray as _ray
        m = _ray.get(_r)
        s = t.column("s").to_numpy()
        d = t.column("d").to_numpy()
        return pa.table({"v": pa.array(
            [int((m[s] & m[d]).sum())], type=pa.int64())})

    viol = sum(int(b.column("v").to_numpy().sum())
               for b in g.edges.map_batches(
                   mis_violations, batch_format="pyarrow").iter_batches(
                   batch_size=None, batch_format="pyarrow"))
    assert viol == 0, f"MIS independence violated on {viol} edges"
    out["mis"]["independence_violations"] = viol

    # ---- JP coloring (owner-resident sharded rounds) ----
    m_col: dict = {}
    col_ds = greedy_coloring(g, seed=0, config=cfg, metrics=m_col)
    assert m_col["mode"] == "sharded"
    col_pdf = col_ds.to_pandas()
    out["coloring"] = {k: (round(v, 3) if isinstance(v, float) else v)
                       for k, v in m_col.items()}
    cnode = col_pdf["node"].to_numpy()
    cidx = np.searchsorted(np.sort(cnode), cnode)
    colors = np.empty(g.num_vertices, dtype=np.int64)
    colors[cidx] = col_pdf["color"].to_numpy()
    assert int(col_pdf["color"].min()) >= 0
    cref = ray.put(colors)

    def color_violations(t: pa.Table, _r=cref) -> pa.Table:
        import ray as _ray
        c = _ray.get(_r)
        s = t.column("s").to_numpy()
        d = t.column("d").to_numpy()
        return pa.table({"v": pa.array(
            [int((c[s] == c[d]).sum())], type=pa.int64())})

    cviol = sum(int(b.column("v").to_numpy().sum())
                for b in g.edges.map_batches(
                    color_violations, batch_format="pyarrow").iter_batches(
                    batch_size=None, batch_format="pyarrow"))
    assert cviol == 0, f"coloring properness violated on {cviol} edges"
    out["coloring"]["properness_violations"] = cviol

    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
