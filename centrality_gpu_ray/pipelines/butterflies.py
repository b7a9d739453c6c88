"""Bipartite butterfly (4-cycle) counting — the bipartite clustering
primitive, companion to directed HITS over the same purchase graph.

A butterfly is a complete 2×2 biclique (u1, u2 | v1, v2): the unit of
cohesion in bipartite graphs exactly as the triangle is in unipartite
ones (Wang et al., "Vertex Priority Based Butterfly Counting for
Large-scale Bipartite Networks", VLDB 2019 — the side-selection trick
below is its degree-ordering idea in aggregate form).

Exact count via wedges: butterflies = Σ over same-side pairs
C(common_neighbors, 2), counted over ONE side only (each butterfly
contributes exactly one pair per side).  Side selection is the whole
scale story: wedges centered on side S number Σ_{x∈S} C(deg(x), 2),
so the engine CENTERS ON THE SIDE WITH THE SMALLER WEDGE SUM — for a
skewed purchase graph (15k customers × deg 40 vs 1k suppliers ×
deg 600) that is ~24M wedge rows instead of ~180M.  The wedge rows
are pair-keyed, map-side pre-aggregated per block, and meet in one
``hash_aggregate`` exchange; the final Σ C(c, 2) folds per block.

Dense-free: nothing driver-side ever holds a per-vertex or per-pair
vector — the two degree sums are hash aggregates and the result is one
scalar row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.nputil import ragged_arange as _ragged
from centrality_gpu_ray.stages.shuffle import hash_aggregate, hash_partition_apply

# per-center pair generation is tiled so no single temp allocation is
# quadratic in one hub's degree: a deg-100k center has ~5e9 pairs, and
# np.triu_indices would allocate them all at once (ADVICE r4)
_PAIR_TILE = 4_000_000


def _distinct_edges(edges_ds, left_col: str, right_col: str,
                    num_partitions: int):
    def norm(t: pa.Table) -> pa.Table:
        return pa.table({
            "l": t.column(left_col).cast(pa.int64()),
            "r": t.column(right_col).cast(pa.int64()),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    # distinct (l, r): multi-edges collapse (a repeated purchase is one
    # relationship edge)
    return hash_aggregate(edges_ds.map_batches(norm,
                                               batch_format="pyarrow"),
                          keys=["l", "r"], aggs=[("one", "min")],
                          num_partitions=num_partitions)


def _wedge_sum(dist, key: str, num_partitions: int) -> int:
    """Σ C(deg, 2) over one side — the wedge volume if that side
    centers. Two tiny folds, no driver vectors."""
    deg = hash_aggregate(dist.map_batches(
        lambda t: pa.table({key: t.column(key),
                            "c": pa.array(np.ones(t.num_rows,
                                                  dtype=np.int64))}),
        batch_format="pyarrow"), keys=[key], aggs=[("c", "sum")],
        num_partitions=num_partitions)
    total = 0
    for b in deg.map_batches(
            lambda t: pa.table({"w": pa.array([int(
                (lambda c: (c * (c - 1) // 2).sum())(
                    t.column("c").to_numpy().astype(np.int64)))],
                type=pa.int64())}),
            batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        total += int(b.column("w").to_numpy().sum())
    return total


def butterfly_count(edges_ds, left_col: str = "src",
                    right_col: str = "dst", num_partitions: int = 32,
                    metrics: dict | None = None) -> pa.Table:
    """Exact global butterfly count of the bipartite graph given as a
    (left, right) edge Dataset (multi-edges collapse).  Returns a
    one-row ``(butterflies, wedges, center_side)`` table."""
    import time

    t0 = time.perf_counter()
    dist = _distinct_edges(edges_ds, left_col, right_col,
                           num_partitions).materialize()
    wl = _wedge_sum(dist, "l", num_partitions)
    wr = _wedge_sum(dist, "r", num_partitions)
    center, other, wedges = (("l", "r", wl) if wl <= wr
                             else ("r", "l", wr))

    def pairs(t: pa.Table) -> pa.Table:
        """One partition of a center's full adjacency → neighbor-pair
        rows, combined per (a, b) within the partition before the
        exchange. Pair generation is TILED over the triangular index
        space (≤ ``_PAIR_TILE`` pairs per temp) so a high-degree hub
        never triggers one quadratic allocation."""
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        c = t.column(center).to_numpy()
        o = t.column(other).to_numpy()
        order = np.lexsort((o, c))
        c_s, o_s = c[order], o[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        sizes = np.diff(np.r_[starts, c_s.size])
        aa, bb = [], []
        for lo, sz in zip(starts, sizes):
            if sz < 2:
                continue
            nb = o_s[lo:lo + sz]
            if sz * (sz - 1) // 2 <= _PAIR_TILE:
                iu = np.triu_indices(sz, k=1)
                aa.append(nb[iu[0]])
                bb.append(nb[iu[1]])
                continue
            i = 0
            while i < sz - 1:
                # greedy anchor-row block whose pair volume fits the
                # tile (a single anchor row is at most sz-1 pairs —
                # linear, always emitted whole)
                j, cnt = i + 1, sz - 1 - i
                while j < sz - 1 and cnt + (sz - 1 - j) <= _PAIR_TILE:
                    cnt += sz - 1 - j
                    j += 1
                rows = np.arange(i, j, dtype=np.int64)
                reps = sz - 1 - rows
                aa.append(np.repeat(nb[rows], reps))
                bb.append(nb[np.repeat(rows + 1, reps) + _ragged(reps)])
                i = j
        if not aa:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        a = np.concatenate(aa)
        b = np.concatenate(bb)
        # within-partition combine: the same (a, b) pair from multiple
        # centers of this partition folds to one row before shipping
        po = np.lexsort((b, a))
        a, b = a[po], b[po]
        head = np.ones(a.size, dtype=bool)
        head[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        idx = np.flatnonzero(head)
        n = np.diff(np.r_[idx, a.size])
        return pa.table({"a": pa.array(a[idx]), "b": pa.array(b[idx]),
                         "n": pa.array(n.astype(np.int64))})

    wedge_rows = hash_partition_apply(dist, [center], pairs,
                                      num_partitions=num_partitions)
    per_pair = hash_aggregate(wedge_rows, keys=["a", "b"],
                              aggs=[("n", "sum")],
                              num_partitions=num_partitions)
    total = 0
    for b in per_pair.map_batches(
            lambda t: pa.table({"bf": pa.array([int(
                (lambda c: (c * (c - 1) // 2).sum())(
                    t.column("n").to_numpy().astype(np.int64)))],
                type=pa.int64())}),
            batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        total += int(b.column("bf").to_numpy().sum())
    center_name = left_col if center == "l" else right_col
    if metrics is not None:
        metrics.update({"sec": time.perf_counter() - t0,
                        "wedges": wedges,
                        "center_side": center_name})
    return pa.table({
        "butterflies": pa.array([total], type=pa.int64()),
        "wedges": pa.array([wedges], type=pa.int64()),
        "center_side": pa.array([center_name]),
    })
