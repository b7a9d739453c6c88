"""CLI — the reference's user surface, Ray-Data-shaped.

The reference runs ``./betc INPUT_FILE [OUTPUT] [NUM_THREADS]``
(``main.cpp:54-72``, ReadMe): read an ``n m`` + ``u v w`` edge-list
text file, compute per-vertex betweenness centrality, print per-vertex
scores (``main.cpp:44-48``, the commented ``%d %f`` loop) and the
active/free vertex counts. This module is the switchover equivalent::

    python -m centrality_gpu_ray INPUT [INPUT2 ...] [options]

    --algo {bc,bc-decomposed,pagerank,components,degrees}   (default bc)
    -o/--out DIR     write range-partitioned parquet + manifest via
                     state.sinks.write_scores instead of stdout
    --weighted       weighted shortest paths (positive int weights)
    --max-sources K  sampled-source approximate BC
    --num-cpus N     ray.init CPU budget (default: leave to Ray)

Owns its Ray session (guarded — a driver that already initialised Ray
keeps its session); the library never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pyarrow as pa


def _compute(algo: str, graph, weighted: bool, max_sources):
    if algo == "bc":
        from centrality_gpu_ray.pipelines.brandes import betweenness_centrality

        return betweenness_centrality(graph, weighted=weighted,
                                      max_sources=max_sources), "bc"
    if algo == "bc-decomposed":
        from centrality_gpu_ray.pipelines.bc_decomp import betweenness_decomposed

        return betweenness_decomposed(graph, weighted=weighted), "bc"
    if algo == "pagerank":
        from centrality_gpu_ray.pipelines.pagerank import pagerank

        return pagerank(graph, weighted=weighted), "pagerank"
    if algo == "components":
        from centrality_gpu_ray.pipelines.components import connected_components

        return connected_components(graph), "component"
    if algo == "degrees":
        import pyarrow as pa

        from centrality_gpu_ray.stages.degrees import degrees
        from centrality_gpu_ray.stages.edges import symmetrize

        # _canon_ds is the deduped canonical edge table in ORIGINAL ids
        out = degrees(symmetrize(graph._canon_ds)).sort("node")
        out = pa.concat_tables(
            out.iter_batches(batch_size=None, batch_format="pyarrow"))
        return out, "degree"
    raise SystemExit(f"unknown --algo {algo!r}")


def run(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m centrality_gpu_ray",
        description="Edge-list centrality engine (Ray Data)")
    p.add_argument("inputs", nargs="+",
                   help="edge-list text file(s): 'n m' header then 'u v [w]' lines")
    p.add_argument("--algo", default="bc",
                   choices=["bc", "bc-decomposed", "pagerank",
                            "components", "degrees"])
    p.add_argument("-o", "--out", default=None,
                   help="output directory (per-input subdir of "
                        "range-partitioned parquet + manifest); "
                        "default prints 'node value' lines")
    p.add_argument("--weighted", action="store_true")
    p.add_argument("--max-sources", type=int, default=None)
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        import ray.data

        from centrality_gpu_ray.pipelines.graph import Graph
        from centrality_gpu_ray.sources.edgelist import read_edgelist

        for path in args.inputs:
            t0 = time.perf_counter()
            graph = Graph(ray.data.from_arrow(read_edgelist(path)))
            table, value_col = _compute(args.algo, graph, args.weighted,
                                        args.max_sources)
            if not isinstance(table, pa.Table):  # sharded paths → Dataset
                table = pa.concat_tables(table.iter_batches(
                    batch_size=None, batch_format="pyarrow"))
            dt = time.perf_counter() - t0
            if args.out:
                from centrality_gpu_ray.state.sinks import write_scores

                stem = os.path.splitext(os.path.basename(path))[0]
                out_dir = os.path.join(args.out, stem)
                manifest = write_scores(
                    table, out_dir,
                    key_col=table.column_names[0],
                    job_meta={"algo": args.algo, "input": path,
                              "weighted": args.weighted})
                print(json.dumps({
                    "input": path, "algo": args.algo, "out": out_dir,
                    "rows": table.num_rows, "sec": round(dt, 3),
                    "partitions": len(manifest["partitions"]),
                    "n_vertices": graph.num_vertices,
                    "n_edges": graph.num_edges}))
            else:
                # the reference's (commented) per-vertex print loop,
                # main.cpp:44-48 — 'node value' per line, node-ordered
                import numpy as np

                keys = table.column(0).to_numpy()
                vals = table.column(value_col).to_numpy()
                order = np.argsort(keys, kind="stable")
                w = sys.stdout.write
                for i in order:
                    w(f"{keys[i]} {vals[i]:.12g}\n")
                print(f"# {path}: {args.algo} n={graph.num_vertices} "
                      f"m={graph.num_edges} sec={dt:.3f}", file=sys.stderr)
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(run())
