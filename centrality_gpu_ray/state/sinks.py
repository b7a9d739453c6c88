"""Result sinks (S3/S5/S6): partitioned, resumable Parquet output.

The reference prints scores to stdout (``printoutput``
``modified_apsp.cpp:223-231``) and writes histogram/debug text files.
Here every result lands as **key-range-partitioned Parquet** — one file
per node-id range plus a manifest — so a rerun can skip completed
partitions and downstream jobs can prune by range (the "resumable
output" requirement).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def write_scores(table: pa.Table, out_dir: str, key_col: str = "node",
                 num_partitions: int = 8, job_meta: dict | None = None) -> dict:
    """Write `table` as range-partitioned parquet + manifest.

    Partition i holds rows with ``hash-free range partitioning``:
    key in [bounds[i], bounds[i+1]). Idempotent: each partition file is
    written tmp→rename; partitions already present and recorded in an
    existing manifest are skipped.
    """
    os.makedirs(out_dir, exist_ok=True)
    keys = table.column(key_col).to_numpy()
    order = np.argsort(keys, kind="stable")
    table = table.take(pa.array(order))
    keys = keys[order]
    n = table.num_rows
    bounds_idx = [round(i * n / num_partitions) for i in range(num_partitions + 1)]

    manifest_path = os.path.join(out_dir, "manifest.json")
    done: set[int] = set()
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prior = json.load(f)
        # Only skip partitions if the prior manifest describes THIS job:
        # same key column, row count, global key range and job metadata.
        # Otherwise stale parquet files from a different table would be
        # kept while the manifest is rewritten with the new table's
        # metadata — silently inconsistent output.
        same_job = (
            prior.get("key_col") == key_col
            and prior.get("rows") == n
            and len(prior.get("partitions", [])) == num_partitions
            and {k: v for k, v in prior.items()
                 if k not in ("key_col", "rows", "partitions", "written_at")}
                == (job_meta or {})
            and (n == 0 or (
                prior["partitions"][0].get("key_min") == int(keys[0])
                and prior["partitions"][-1].get("key_max") == int(keys[-1])))
        )
        if same_job:
            done = {p["partition"] for p in prior.get("partitions", [])}

    parts = []
    for i in range(num_partitions):
        lo, hi = bounds_idx[i], bounds_idx[i + 1]
        fname = f"part-{i:05d}.parquet"
        final = os.path.join(out_dir, fname)
        entry = {
            "partition": i, "file": fname, "rows": hi - lo,
            "key_min": int(keys[lo]) if hi > lo else None,
            "key_max": int(keys[hi - 1]) if hi > lo else None,
        }
        if i not in done or not os.path.exists(final):
            tmp = final + ".tmp"
            pq.write_table(table.slice(lo, hi - lo), tmp)
            os.replace(tmp, final)
        parts.append(entry)

    manifest = {"key_col": key_col, "rows": n, "partitions": parts,
                "written_at": time.time(), **(job_meta or {})}
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, manifest_path)
    return manifest


def read_scores(out_dir: str) -> pa.Table:
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    return pa.concat_tables([
        pq.read_table(os.path.join(out_dir, p["file"]))
        for p in manifest["partitions"] if p["rows"]
    ])


def component_size_histogram(components, num_partitions: int = 16) -> pa.Table:
    """(size, num_components) desc — the reference's BCC size histogram
    writer (``print_bicc_hist_to_file`` ``bicc.cpp:53-79``) as two
    chained grouped counts.

    Accepts either a ``pyarrow.Table`` (small/dense path: one in-memory
    double group) or a ``ray.data.Dataset`` of per-vertex component
    labels (distributed path: two ``hash_aggregate`` exchanges — count
    per component, then count per size — so the O(n) per-vertex table
    never materializes on the driver; only the tiny (size, count)
    histogram does)."""
    if isinstance(components, pa.Table):
        comp = components.column("component").to_numpy()
        _, counts = np.unique(comp, return_counts=True)
        size_vals, n_comp = np.unique(counts, return_counts=True)
        order = np.argsort(-size_vals)
        return pa.table({
            "size": pa.array(size_vals[order].astype(np.int64)),
            "num_components": pa.array(n_comp[order].astype(np.int64)),
        })

    from centrality_gpu_ray.stages.shuffle import hash_aggregate

    per_comp = hash_aggregate(components.select_columns(["component"]),
                              ["component"], [("component", "count_all")],
                              num_partitions=num_partitions)
    per_comp = per_comp.map_batches(
        lambda t: pa.table({"size": t.column("count")}),
        batch_format="pyarrow")
    hist = hash_aggregate(per_comp, ["size"], [("size", "count_all")],
                          num_partitions=max(1, num_partitions // 4))
    parts = list(hist.iter_batches(batch_size=None, batch_format="pyarrow"))
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table({"size": pa.array([], type=pa.int64()),
                         "num_components": pa.array([], type=pa.int64())})
    t = pa.concat_tables(parts)
    sizes = t.column("size").to_numpy().astype(np.int64)
    cnts = t.column("count").to_numpy().astype(np.int64)
    order = np.argsort(-sizes)
    return pa.table({"size": pa.array(sizes[order]),
                     "num_components": pa.array(cnts[order])})
