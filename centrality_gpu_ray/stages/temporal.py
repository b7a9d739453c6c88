"""Temporal binary operators: distributed as-of join.

Ray Data has no as-of join; the reference engine has none either (its
closest analog is the level-ordered arrangement in
``arrangelevels.cpp:11-53``), but a training-data pipeline over event
streams needs one constantly (attach the latest model version / user
state / order at or before each event's timestamp). Implemented
Ray-Data-first per the design rules: one ``hash_copartition_apply``
exchange keyed on the join key, then a fully vectorized per-partition
merge — no per-key Python loop, no driver materialization.

Per-partition algorithm (the union-lexsort trick):
sort the right side by (key, time, tiebreak), concatenate both sides'
key/time columns with a side flag that orders left rows AFTER right
rows at equal (key, time) (backward-inclusive semantics), lexsort the
union, and take ``cumsum(is_right) - 1`` at each left row — the last
right row at or before it in (key, time) order.  A candidate with a
different key value means "no match".  O((L+R) log(L+R)) per
partition, overflow-free for any int64 key / timestamp domain.

Tie-break is deterministic by construction: among right rows sharing
the latest time <= t, the one with the LARGEST tiebreak column wins
(they sort last in the union).  Deterministic output is what lets the
driver value-hash this operator against a window-function SQL oracle.

Partitioning assumption (documented per the custom-operator rule): all
rows of one join key must fit in one reduce task.  Keys are users /
entities — bounded per-key cardinality; a key whose history exceeds a
block should be range-bucketed by time first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.stages.shuffle import hash_copartition_apply


def _as_i64(col: pa.ChunkedArray) -> np.ndarray:
    """Timestamps and ints both become comparable int64 (us for ts)."""
    arr = col.cast(pa.int64()) if pa.types.is_timestamp(col.type) else col
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def asof_join(left_ds, right_ds, left_on: str, right_on: str,
              left_by: str, right_by: str, right_cols: list[str],
              tiebreak: str | None = None, num_partitions: int = 32):
    """For every left row, attach ``right_cols`` from the latest right
    row with equal key (``left_by == right_by``) and
    ``right_on <= left_on`` (backward-inclusive as-of). Unmatched left
    rows keep all their columns with nulls in ``right_cols``.

    ``tiebreak``: right column that resolves equal-time ties (largest
    wins); defaults to the first of ``right_cols``.
    """
    tb = tiebreak or right_cols[0]
    out_names = None  # fixed below per partition from the left schema

    def part(left: pa.Table, right: pa.Table) -> pa.Table:
        if left.num_rows == 0 or right.num_rows == 0:
            cols = {name: left.column(name) for name in left.column_names}
            for name in right_cols:
                t = (right.schema.field(name).type
                     if name in right.column_names else pa.int64())
                cols["r_" + name if name in cols else name] = \
                    pa.nulls(left.num_rows, type=t)
            return pa.table(cols)
        lk = _as_i64(left.column(left_by)) if left.num_rows else \
            np.empty(0, np.int64)
        lt = _as_i64(left.column(left_on)) if left.num_rows else \
            np.empty(0, np.int64)
        rk = _as_i64(right.column(right_by)) if right.num_rows else \
            np.empty(0, np.int64)
        rt = _as_i64(right.column(right_on)) if right.num_rows else \
            np.empty(0, np.int64)
        rtb = _as_i64(right.column(tb)) if right.num_rows else \
            np.empty(0, np.int64)

        # right sorted by (key, time, tiebreak): the winner of any
        # (key, time<=t) prefix is simply its last row
        r_order = np.lexsort((rtb, rt, rk))
        rk, rt = rk[r_order], rt[r_order]

        nr, nl = rk.size, lk.size
        keys = np.concatenate([rk, lk])
        times = np.concatenate([rt, lt])
        side = np.concatenate([np.zeros(nr, np.int8), np.ones(nl, np.int8)])
        u = np.lexsort((side, times, keys))  # left after right on ties
        is_right = side[u] == 0
        last_right = np.cumsum(is_right) - 1  # union-pos -> right count-1
        left_pos_in_union = np.empty(nr + nl, np.int64)
        left_pos_in_union[u] = np.arange(nr + nl)
        cand = last_right[left_pos_in_union[nr:]]  # per left row
        matched = cand >= 0
        safe = np.where(matched, cand, 0)
        matched &= rk[safe] == lk  # same-key check
        take = r_order[safe]

        cols = {name: left.column(name) for name in left.column_names}
        valid = pa.array(matched)
        for name in right_cols:
            picked = right.column(name).take(pa.array(take))
            combined = picked.combine_chunks() if picked.num_chunks else picked
            cols["r_" + name if name in cols else name] = \
                pa.compute.if_else(valid, combined,
                                   pa.scalar(None, type=picked.type))
        return pa.table(cols)

    return hash_copartition_apply(
        left_ds, right_ds, [left_by], [right_by], part,
        num_partitions=num_partitions)
