"""Per-superstep checkpoints with lineage manifests.

The reference has no checkpoint/resume — any failure reruns from
scratch (SURVEY.md §4 "Stragglers / retries"). The north_rule requires
every superstep to checkpoint per-partition state + lineage so jobs
resume mid-iteration.

Layout (all writes are write-temp-then-rename, so a checkpoint either
exists completely with its manifest or not at all — idempotent under
task/driver retry, SURVEY.md §7.5.4)::

    <dir>/step_<k>/
        part-<i>.parquet     # vertex-state shard i (row-range partition)
        manifest.json        # superstep id, per-partition lineage, metrics

Resume = find the highest ``step_k`` with a ``manifest.json`` and
continue from it (:func:`latest_checkpoint`).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "manifest.json"


def _step_dir(root: str, step: int) -> str:
    return os.path.join(root, f"step_{step:06d}")


def write_checkpoint(root: str, step: int, state: pa.Table, meta: dict,
                     num_partitions: int = 4) -> str:
    """Atomically write vertex-state `state` + lineage manifest."""
    os.makedirs(root, exist_ok=True)
    final = _step_dir(root, step)
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    n = state.num_rows
    chunk = max(1, -(-n // num_partitions))
    lineage = []
    for i in range(num_partitions):
        lo, hi = i * chunk, min((i + 1) * chunk, n)
        if lo >= n and i > 0:
            break
        part = state.slice(lo, hi - lo)
        fname = f"part-{i:05d}.parquet"
        pq.write_table(part, os.path.join(tmp, fname))
        lineage.append({"partition": i, "file": fname, "row_lo": lo,
                        "row_hi": hi, "rows": part.num_rows})
    manifest = dict(meta)
    manifest.update({
        "superstep": step,
        "rows": n,
        "partitions": lineage,
        "written_at": time.time(),
    })
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return final


def latest_checkpoint(root: str) -> tuple[int, dict, pa.Table] | None:
    """(step, manifest, state table) of the newest complete checkpoint."""
    if not root or not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        if name.startswith("step_") and not name.endswith(".tmp"):
            mpath = os.path.join(root, name, MANIFEST)
            if os.path.exists(mpath):
                steps.append(int(name.split("_")[1]))
    if not steps:
        return None
    step = max(steps)
    d = _step_dir(root, step)
    with open(os.path.join(d, MANIFEST)) as f:
        manifest = json.load(f)
    parts = [pq.read_table(os.path.join(d, p["file"]))
             for p in manifest["partitions"]]
    return step, manifest, pa.concat_tables(parts)


class CheckpointManager:
    """Thin per-run helper bound to (dir, algorithm, every-k)."""

    def __init__(self, root: str | None, algorithm: str, every: int = 1,
                 num_partitions: int = 4):
        self.root = root
        self.algorithm = algorithm
        self.every = max(1, every)
        self.num_partitions = num_partitions

    def maybe_write(self, step: int, state: pa.Table, **metrics) -> str | None:
        if self.root is None or step % self.every:
            return None
        meta = {"algorithm": self.algorithm, **metrics}
        return write_checkpoint(self.root, step, state, meta, self.num_partitions)

    def resume(self) -> tuple[int, dict, pa.Table] | None:
        if self.root is None:
            return None
        found = latest_checkpoint(self.root)
        if found and found[1].get("algorithm") not in (None, self.algorithm):
            raise ValueError(
                f"checkpoint dir {self.root} holds {found[1]['algorithm']} state, "
                f"not {self.algorithm}")
        return found
