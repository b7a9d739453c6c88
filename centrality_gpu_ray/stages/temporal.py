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


def range_join(left_ds, right_ds, left_on: str, right_on: str,
               left_by: str, right_by: str, right_cols: list[str],
               before: int = 0, after: int = 0, num_partitions: int = 32,
               max_matches_per_row: int = 100_000):
    """Interval (range) join: for every left row, emit one output row
    per right row with equal key and ``left_on - before <= right_on <=
    left_on + after`` (inclusive both ends; ``before``/``after`` in the
    column's int64 domain — microseconds for timestamps). Inner join:
    unmatched left rows are dropped.

    Per-partition plan (same co-partition exchange as :func:`asof_join`):
    lexsort the right side by (key, time), then ONE vectorized
    lexicographic ``searchsorted`` over a structured (key, time) view
    for the low/high bounds of every left row, then a repeat/arange
    expansion — no per-row Python. O((L+R) log R + output) per
    partition.

    Rows whose match count exceeds ``max_matches_per_row`` are truncated
    to the earliest matches and LOGGED (log-and-truncate, never silent)
    — a hot key (monorepo-style skew) should be time-bucketed upstream.
    """
    def part(left: pa.Table, right: pa.Table) -> pa.Table:
        return _range_match(left, right, left_on, right_on, left_by,
                            right_by, right_cols, before, after,
                            max_matches_per_row)

    return hash_copartition_apply(
        left_ds, right_ds, [left_by], [right_by], part,
        num_partitions=num_partitions)


_PAIR_T = np.dtype([("k", np.int64), ("t", np.int64)])


def _struct(k: np.ndarray, t: np.ndarray) -> np.ndarray:
    s = np.empty(k.size, dtype=_PAIR_T)
    s["k"], s["t"] = k, t
    return s


def _range_match(left: pa.Table, right: pa.Table, left_on: str,
                 right_on: str, left_by: str, right_by: str,
                 right_cols: list[str], before: int, after: int,
                 max_matches_per_row: int) -> pa.Table:
    """One partition of :func:`range_join` (module-level so the match +
    truncation logic is unit-testable in-process)."""
    import logging
    log = logging.getLogger(__name__)

    def _empty_out() -> pa.Table:
        cols, names = [], []
        for name in left.column_names:
            names.append(name)
            cols.append(pa.chunked_array([[]], type=left.schema.field(name).type))
        for name in right_cols:
            t = right.schema.field(name).type
            names.append("r_" + name if name in left.column_names else name)
            cols.append(pa.chunked_array([[]], type=t))
        return pa.table(dict(zip(names, cols)))

    if left.num_rows == 0 or right.num_rows == 0:
        return _empty_out()
    lk, lt = _as_i64(left.column(left_by)), _as_i64(left.column(left_on))
    rk, rt = _as_i64(right.column(right_by)), _as_i64(right.column(right_on))
    r_order = np.lexsort((rt, rk))
    rs = _struct(rk[r_order], rt[r_order])
    lo = np.searchsorted(rs, _struct(lk, lt - before), side="left")
    hi = np.searchsorted(rs, _struct(lk, lt + after), side="right")
    counts = hi - lo
    over = counts > max_matches_per_row
    if over.any():
        log.warning(
            "range_join: truncating %d left rows to %d matches each "
            "(max count was %d) — time-bucket the hot key upstream",
            int(over.sum()), max_matches_per_row, int(counts.max()))
        counts = np.minimum(counts, max_matches_per_row)
    total = int(counts.sum())
    if total == 0:
        return _empty_out()
    left_take = np.repeat(np.arange(lk.size), counts)
    starts = np.cumsum(counts) - counts
    offsets = np.arange(total) - np.repeat(starts, counts)
    right_take = r_order[np.repeat(lo, counts) + offsets]

    lt_arr, rt_arr = pa.array(left_take), pa.array(right_take)
    cols = {name: left.column(name).take(lt_arr)
            for name in left.column_names}
    for name in right_cols:
        cols["r_" + name if name in cols else name] = \
            right.column(name).take(rt_arr)
    return pa.table(cols)
