"""Mid-superstep kill/resume chaos at sf0.1 — SURVEY §5 item 4.

Distributed PageRank over the sf0.1 lineitem graph with per-superstep
checkpoints; a timer thread SIGKILLs one shard/owner actor mid-run
(its resident rank chunk dies with it), then a FRESH graph + pool
resumes from the surviving checkpoints. The resumed scores must be
BIT-IDENTICAL to an uninterrupted run.

Run: python scripts/demo_chaos_resume.py [sf_dir] (owns its Ray
session; defaults /root/testdata/sf0.1 / 32 CPUs via RAY_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RAY_worker_niceness", "0")


def main() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from centrality_gpu_ray import graph_queries as gq
    from centrality_gpu_ray.config import EngineConfig
    from centrality_gpu_ray.state.chaos import run_chaos_pagerank

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    def make_graph():
        return gq.lineitem_graph(sf_dir, mode="distributed",
                                 config=EngineConfig())

    def cfg_factory(ck):
        # fixed 40 supersteps (tolerance 0): a predictable window for
        # the kill to land mid-run, checkpoint every superstep
        return EngineConfig(tolerance=0.0, max_supersteps=40,
                            checkpoint_dir=ck, checkpoint_every=1)

    out = run_chaos_pagerank(make_graph, cfg_factory,
                             kill_after_steps=5)
    out["sf_dir"] = sf_dir
    shutil.rmtree(out.pop("checkpoint_dir"), ignore_errors=True)
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
