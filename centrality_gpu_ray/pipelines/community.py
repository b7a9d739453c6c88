"""Community-partition quality: Newman modularity over any (node,
label) partition — labelprop communities, connected components, or an
external clustering.

The reference has no partition-quality operator (its outputs are
per-vertex centralities only), but any engine that ships label
propagation needs the standard way to SCORE the partition it found.
Everything is exact-integer so the result is value-checkable in SQL:

    Q = Σ_c [ in2_c / m2  −  (deg_c / m2)² ]
      = ( Σ_c (m2·in2_c − deg_c²) ) / m2²          -- exact integers

with ``in2_c`` = twice the intra-community edge weight, ``deg_c`` the
community's (weighted) degree sum and ``m2 = Σ_c deg_c`` twice the
total edge weight.

Shapes: labels attach to both edge endpoints via the hash-partitioned
lookup join (the dictionary side is co-partitioned, never broadcast —
a 100 TB edge table with a 1 TB label table works), per-community sums
go through ``hash_aggregate``, and the two global folds are per-block
O(blocks)-row driver reductions.  int64 throughout; the driver-side
folds use Python ints, so ``q_num`` cannot overflow even when m2² no
longer fits 64 bits.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.stages.shuffle import hash_aggregate, hash_lookup_join


def _with_weight(edges_ds, weighted: bool):
    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        w = (t.column("weight").to_numpy().astype(np.int64) if weighted
             else np.ones(n, dtype=np.int64))
        return pa.table({"src": t.column("src").cast(pa.int64()),
                         "dst": t.column("dst").cast(pa.int64()),
                         "w": pa.array(w)})

    return edges_ds.map_batches(fn, batch_format="pyarrow")


def community_stats(edges_ds, labels_ds, weighted: bool = False,
                    num_partitions: int = 32):
    """Per-community modularity ingredients.

    Args:
        edges_ds: canonical undirected edge Dataset — one row per edge,
            no self-loops, no duplicates (``stages.edges.dedup_edges``
            output; ``Graph.canonical_edges`` shape), columns
            (src, dst[, weight]).
        labels_ds: Dataset or ``pa.Table`` of (node, label) covering
            every edge endpoint.
        weighted: use the ``weight`` column (else every edge counts 1).

    Returns a Dataset of ``(community, intra2, deg_sum)`` — all int64,
    ``intra2`` = 2·(intra-community weight), ``Σ deg_sum = m2``.
    """
    import ray.data

    if isinstance(labels_ds, pa.Table):
        labels_ds = ray.data.from_arrow(labels_ds)
    labels_ds = labels_ds.map_batches(
        lambda t: pa.table({"node": t.column("node").cast(pa.int64()),
                            "label": t.column("label").cast(pa.int64()),
                            "one": pa.array(np.ones(t.num_rows,
                                                    dtype=np.int64))}),
        batch_format="pyarrow")
    # loud duplicate-node guard (ADVICE r4): hash_lookup_join attaches
    # an arbitrary first match for a duplicated node, which would yield
    # a plausible but contract-violating Q — match the partial-coverage
    # guard's fail-loud convention. One aggregate pass; the deduped
    # (node, label) rows then serve as the join dictionary.
    counted = hash_aggregate(labels_ds, keys=["node"],
                             aggs=[("label", "min"), ("one", "sum")],
                             num_partitions=num_partitions)

    def dedup_guard(t: pa.Table) -> pa.Table:
        ones = t.column("one").to_numpy()
        if (ones > 1).any():
            dup = t.column("node").to_numpy()[ones > 1]
            raise ValueError(
                "community_stats: labels_ds holds multiple rows for "
                f"{dup.size} node(s) (e.g. {dup[:5].tolist()}) — a "
                "(node, label) partition must label each node once")
        return t.select(["node", "label"])

    labels_ds = counted.map_batches(dedup_guard, batch_format="pyarrow")
    ew = _with_weight(edges_ds, weighted)

    # intra-community edge weight: label both endpoints in-shuffle.
    # outer_fill sentinel + loud guard: an inner join would silently
    # DROP edges whose endpoint is missing from the label table —
    # inconsistently between the intra and degree sides — and return a
    # plausible but wrong Q (labels not covering every endpoint is a
    # caller contract violation, fail loudly per the engine convention)
    _MISSING = -(1 << 62)
    lab_src = hash_lookup_join(ew, labels_ds, row_key="src",
                               dict_key="node", attach={"label": "ls"},
                               outer_fill={"ls": _MISSING},
                               num_partitions=num_partitions)
    lab_both = hash_lookup_join(lab_src, labels_ds, row_key="dst",
                                dict_key="node", attach={"label": "ld"},
                                outer_fill={"ld": _MISSING},
                                num_partitions=num_partitions)

    def intra_rows(t: pa.Table) -> pa.Table:
        ls = t.column("ls").to_numpy()
        ld = t.column("ld").to_numpy()
        if ((ls == _MISSING) | (ld == _MISSING)).any():
            raise ValueError(
                "community_stats: labels_ds does not cover every edge "
                "endpoint — modularity over partial labels is undefined")
        keep = ls == ld
        return pa.table({"community": pa.array(ls[keep]),
                         "intra": pa.array(
                             t.column("w").to_numpy()[keep])})

    intra = hash_aggregate(
        lab_both.map_batches(intra_rows, batch_format="pyarrow"),
        keys=["community"], aggs=[("intra", "sum")],
        num_partitions=num_partitions)

    # per-community (weighted) degree sum: explode both directions,
    # sum per node, label, sum per community
    def explode(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        w = t.column("w").to_numpy()
        return pa.table({"node": pa.array(np.concatenate([s, d])),
                         "deg": pa.array(np.concatenate([w, w]))})

    per_node = hash_aggregate(ew.map_batches(explode, batch_format="pyarrow"),
                              keys=["node"], aggs=[("deg", "sum")],
                              num_partitions=num_partitions)
    per_node = hash_lookup_join(per_node, labels_ds, row_key="node",
                                dict_key="node",
                                attach={"label": "community"},
                                outer_fill={"community": _MISSING},
                                num_partitions=num_partitions)

    def deg_guard(t: pa.Table) -> pa.Table:
        if (t.column("community").to_numpy() == _MISSING).any():
            raise ValueError(
                "community_stats: labels_ds does not cover every edge "
                "endpoint — modularity over partial labels is undefined")
        return t.select(["community", "deg"])

    deg = hash_aggregate(per_node.map_batches(deg_guard,
                                              batch_format="pyarrow"),
                         keys=["community"], aggs=[("deg", "sum")],
                         num_partitions=num_partitions)

    # every community has degree mass; intra can be empty (all-cut
    # partitions) — left-outer with 0 fill
    out = hash_lookup_join(deg, intra, row_key="community",
                           dict_key="community", attach={"intra": "intra"},
                           outer_fill={"intra": 0},
                           num_partitions=num_partitions)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "community": t.column("community").cast(pa.int64()),
            "intra2": pa.array(
                2 * t.column("intra").to_numpy().astype(np.int64)),
            "deg_sum": t.column("deg").cast(pa.int64()),
        })

    return out.map_batches(finalize, batch_format="pyarrow")


def modularity_score(stats) -> dict:
    """Fold ``community_stats`` output to the exact global score:
    ``{m2, q_num, q_micro, communities}`` with
    ``Q = q_num / m2²`` and ``q_micro = floor(Q·1e6 + 0.5)``.

    Two per-block partial folds (m2 first — the q terms need it), each
    O(blocks) driver rows; exact Python-int arithmetic on the driver."""

    def part1(t: pa.Table) -> pa.Table:
        return pa.table({
            "deg": pa.array([int(t.column("deg_sum").to_numpy().sum())]),
            "n": pa.array([t.num_rows])})

    m2 = 0
    n_comm = 0
    mat = stats.materialize()
    for b in mat.map_batches(part1, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        m2 += int(b.column("deg").to_numpy().sum())
        n_comm += int(b.column("n").to_numpy().sum())

    def part2(t: pa.Table, _m2=m2) -> pa.Table:
        i2 = t.column("intra2").to_numpy().astype(object)
        dg = t.column("deg_sum").to_numpy().astype(object)
        q = sum(_m2 * a - b * b for a, b in zip(i2, dg))
        return pa.table({"q": pa.array([str(int(q))], type=pa.string())})

    q_num = 0
    for b in mat.map_batches(part2, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        q_num += sum(int(s) for s in b.column("q").to_pylist())

    q = q_num / (m2 * m2) if m2 else 0.0
    import math
    return {"m2": m2, "q_num": q_num, "communities": n_comm,
            "q_micro": int(math.floor(q * 1e6 + 0.5))}
