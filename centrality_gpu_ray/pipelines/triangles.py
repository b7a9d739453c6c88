"""Triangle counting by degree-ordered orientation + wedge semi-join.

The reference's skew answer was whole-graph decomposition; ours (per
SURVEY.md §4 and the north_rule) is the classic degree-ordered
orientation: direct each undirected edge ``u→v`` iff
``(deg(u), u) < (deg(v), v)``. Every triangle then has exactly one
*apex* vertex with two out-edges, out-degrees are bounded by O(√m), and
wedge generation skew is capped.

Pipeline: oriented edges → wedges (all out-neighbor pairs per apex) →
semi-join wedges against the oriented edge set on the closing pair →
per-vertex credit (each matched wedge gives apex and both endpoints one
triangle). Local mode does the join with ``np.isin`` on packed u64 keys
(the same packing trick as ``bcc_bfs.cpp:1001-1003``); distributed mode
uses a broadcast packed-key set when the edge set is small and a
hash-partitioned packed-key semi-join beyond that.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.graph import Graph

BROADCAST_EDGE_LIMIT = 50_000_000  # packed u64 keys ≤ 400 MB broadcast


def _orient(s: np.ndarray, d: np.ndarray, deg: np.ndarray):
    """Canonical edges → oriented (a, b) with (deg, id) order."""
    swap = (deg[d] < deg[s]) | ((deg[d] == deg[s]) & (d < s))
    a = np.where(swap, d, s)
    b = np.where(swap, s, d)
    return a, b


def _wedges_from_adj(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, ...]:
    """All out-neighbor pairs per apex → (apex, x, y), fully vectorized.

    Shift-expansion: with edges sorted by (apex, neighbor), the pairs at
    distance ``s`` within each apex's run are ``(b[i], b[i+s])`` for all
    ``i`` whose in-run position leaves room. One vectorized mask per
    shift, ≤ max-out-degree shifts total — O(#wedges) work, no Python
    loop over apexes. Orientation bounds out-degree (≈√2m), so the
    shift count is small even on skewed graphs.
    """
    if a.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    n = a_s.size
    run_start = np.r_[True, a_s[1:] != a_s[:-1]]
    starts = np.flatnonzero(run_start)
    counts = np.diff(np.r_[starts, n])
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    # each edge position e (in-run pos i of a k-run) is the FIRST element
    # of (k-1-i) pairs, the second elements being the next k-1-i edges
    rep = np.repeat(counts, counts) - pos - 1            # pairs led by e
    total = int(rep.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    first_idx = np.repeat(np.arange(n, dtype=np.int64), rep)
    seg_start = np.cumsum(rep) - rep                     # output offset per e
    within = np.arange(total, dtype=np.int64) - np.repeat(seg_start, rep)
    second_idx = first_idx + 1 + within
    return a_s[first_idx], b_s[first_idx], b_s[second_idx]


def triangle_counts(graph: Graph, config: EngineConfig | None = None,
                    metrics: dict | None = None) -> pa.Table:
    """Returns ``(node, triangles)`` per-vertex counts (vertices with 0
    included). Total = sum/3 · 3 = matched wedges."""
    cfg = config or graph.config
    if getattr(graph, "sharded", False):
        return _count_sharded(graph, cfg, metrics)
    t0 = time.perf_counter()
    deg = graph.out_degree
    if graph.mode == "local":
        s, d, _ = graph.local_arrays()
        a, b = _orient(s, d, deg)
        tri = _count_local(graph, a, b)
    else:
        tri = _count_distributed(graph, cfg, deg)
    elapsed = time.perf_counter() - t0
    if metrics is not None:
        metrics.update({
            "sec": elapsed,
            "total_triangles": int(tri.sum() // 3),
            "mode": graph.mode,
        })
    return pa.table({
        "node": pa.array(graph.node_ids, type=pa.int64()),
        "triangles": pa.array(tri.astype(np.int64)),
    })


def _pack(x: np.ndarray, y: np.ndarray, n: int) -> np.ndarray:
    lo = np.minimum(x, y)
    hi = np.maximum(x, y)
    return lo * np.int64(n) + hi


def _count_local(graph: Graph, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    n = graph.num_vertices
    apex, x, y = _wedges_from_adj(a, b)
    edge_keys = np.sort(_pack(a, b, n))
    wedge_keys = _pack(x, y, n)
    idx = np.searchsorted(edge_keys, wedge_keys)
    idx = np.minimum(idx, edge_keys.size - 1)
    hit = edge_keys.size > 0
    match = (edge_keys[idx] == wedge_keys) if hit else np.zeros(0, dtype=bool)
    tri = np.zeros(n, dtype=np.int64)
    for arr in (apex[match], x[match], y[match]):
        np.add.at(tri, arr, 1)
    return tri


def _count_distributed(graph: Graph, cfg: EngineConfig, deg: np.ndarray) -> np.ndarray:
    """Explicit apex-hash shuffle: each reduce task owns a set of apexes
    (all their out-edges co-located), generates that slice's wedges
    vectorized, semi-joins them against the broadcast sorted packed edge
    set, and returns partial per-vertex credits. One shuffle total;
    wedge work parallelizes across reducers. Beyond
    ``BROADCAST_EDGE_LIMIT`` edges the closing-pair membership test
    switches to a hash-partitioned packed-key semi-join."""
    import ray

    n = graph.num_vertices
    deg_ref = ray.put(deg)

    def orient_batch(batch: pa.Table, _deg_ref=deg_ref) -> pa.Table:
        dg = ray.get(_deg_ref)
        s = batch.column("s").to_numpy()
        d = batch.column("d").to_numpy()
        a, b = _orient(s, d, dg)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    oriented = graph.edges.map_batches(orient_batch, batch_format="pyarrow",
                                       batch_size=cfg.batch_size).materialize()

    if graph.num_edges > BROADCAST_EDGE_LIMIT:
        # Scale path: apex-hash exchange generates each partition's
        # wedges in ONE vectorized pass (many apexes per reduce — no
        # per-group Python), then a hash-partitioned semi-join of the
        # wedges against the packed canonical closing-edge keys.
        # Wedge pairs (x, y) come out ascending by id, while oriented
        # edges keep the (deg, id) orientation which may be
        # high-id→low-id — both sides use the (min,max)-packed key.
        from centrality_gpu_ray.stages.shuffle import (hash_partition_apply,
                                                       hash_semi_join)

        def wedge_part(tbl: pa.Table) -> pa.Table:
            apex, x, y = _wedges_from_adj(
                tbl.column("a").to_numpy(zero_copy_only=False),
                tbl.column("b").to_numpy(zero_copy_only=False))
            return pa.table({"apex": pa.array(apex),
                             "key": pa.array(_pack(x, y, n))})

        def edge_keys(tbl: pa.Table) -> pa.Table:
            return pa.table({"key": pa.array(
                _pack(tbl.column("a").to_numpy(),
                      tbl.column("b").to_numpy(), n))})

        wedges = hash_partition_apply(oriented, ["a"], wedge_part,
                                      num_partitions=cfg.num_partitions)
        keys_ds = oriented.map_batches(edge_keys, batch_format="pyarrow",
                                       batch_size=cfg.batch_size)
        matched = hash_semi_join(wedges, keys_ds, on="key",
                                 num_partitions=cfg.num_partitions)
        tri = np.zeros(n, dtype=np.int64)
        counted = matched.map_batches(_wedge_credit_packed(n),
                                      batch_format="pyarrow")
        for batch in counted.iter_batches(batch_size=None,
                                          batch_format="pyarrow"):
            np.add.at(tri, batch.column("v").to_numpy(),
                      batch.column("c").to_numpy())
        return tri

    # broadcast path: sorted packed edge keys shared by every reducer
    tbl = pa.concat_tables(list(oriented.iter_batches(batch_size=None,
                                                      batch_format="pyarrow")))
    keys = np.sort(_pack(tbl.column("a").to_numpy(), tbl.column("b").to_numpy(), n))
    keys_ref = ray.put(keys)
    P = max(1, cfg.num_partitions)

    @ray.remote(num_returns=P)
    def split_by_apex(block: pa.Table):
        a = block.column("a").to_numpy()
        part = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(33)).astype(np.int64) % P
        order = np.argsort(part, kind="stable")
        sorted_tbl = block.take(pa.array(order))
        bounds = np.searchsorted(part[order], np.arange(P + 1))
        shards = [sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
                  for i in range(P)]
        return tuple(shards) if P > 1 else shards[0]

    @ray.remote
    def count_part(keys_in, nv, *shards):
        tabs = [s for s in shards if s.num_rows]
        if not tabs:
            z = np.empty(0, dtype=np.int64)
            return z, z
        merged = pa.concat_tables(tabs)
        a = merged.column("a").to_numpy()
        b = merged.column("b").to_numpy()
        apex, x, y = _wedges_from_adj(a, b)
        if apex.size == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z
        wk = _pack(x, y, nv)
        idx = np.minimum(np.searchsorted(keys_in, wk), keys_in.size - 1)
        match = keys_in[idx] == wk
        v = np.concatenate([apex[match], x[match], y[match]])
        uniq, cnt = np.unique(v, return_counts=True)
        return uniq, cnt.astype(np.int64)

    block_refs = []
    for bundle in oriented.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                block_refs.append(block_ref)
    shard_lists = [split_by_apex.remote(br) for br in block_refs]
    if P == 1:
        parts = [count_part.remote(keys_ref, n, *shard_lists)]
    else:
        parts = [count_part.remote(keys_ref, n, *[s[p] for s in shard_lists])
                 for p in range(P)]
    tri = np.zeros(n, dtype=np.int64)
    for uniq, cnt in ray.get(parts):
        np.add.at(tri, uniq, cnt)
    return tri


def _count_sharded(graph: Graph, cfg: EngineConfig, metrics: dict | None):
    """>dense_vertex_limit triangles, fully Dataset-shaped: degrees via
    hash aggregate, degree attachment to both endpoints via
    co-partitioned lookup joins (no broadcast degree vector), apex-hash
    wedge generation, packed-key semi-join, per-vertex credits via hash
    aggregate, zeros filled by an outer lookup join against the vertex
    dictionary. Returns a Dataset of (node, triangles)."""
    import time as _time

    import ray
    import ray.data

    from centrality_gpu_ray.pipelines.vertexdict import _DictReader
    from centrality_gpu_ray.stages.shuffle import (hash_aggregate,
                                                   hash_lookup_join,
                                                   hash_partition_apply,
                                                   hash_semi_join)

    t0 = _time.perf_counter()
    n = graph.num_vertices
    P = cfg.num_partitions

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([t.column("s").to_numpy(),
                            t.column("d").to_numpy()])
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq),
                         "c": pa.array(cnt.astype(np.int64))})

    deg_ds = hash_aggregate(
        graph.edges.map_batches(deg_partial, batch_format="pyarrow"),
        ["v"], [("c", "sum")], num_partitions=P)

    pairs = graph.edges.map_batches(
        lambda t: t.select(["s", "d"]), batch_format="pyarrow")
    with_ds = hash_lookup_join(pairs, deg_ds, "s", "v", {"c": "_deg_s"},
                               num_partitions=P)
    with_dd = hash_lookup_join(with_ds, deg_ds, "d", "v", {"c": "_deg_d"},
                               num_partitions=P)

    def orient_b(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy()
        d = t.column("d").to_numpy()
        gs = t.column("_deg_s").to_numpy()
        gd = t.column("_deg_d").to_numpy()
        swap = (gd < gs) | ((gd == gs) & (d < s))
        return pa.table({"a": pa.array(np.where(swap, d, s)),
                         "b": pa.array(np.where(swap, s, d))})

    oriented = with_dd.map_batches(orient_b, batch_format="pyarrow",
                                   batch_size=cfg.batch_size).materialize()

    def wedge_part(tbl: pa.Table) -> pa.Table:
        apex, x, y = _wedges_from_adj(
            tbl.column("a").to_numpy(zero_copy_only=False),
            tbl.column("b").to_numpy(zero_copy_only=False))
        return pa.table({"apex": pa.array(apex),
                         "key": pa.array(_pack(x, y, n))})

    def edge_keys(tbl: pa.Table) -> pa.Table:
        return pa.table({"key": pa.array(
            _pack(tbl.column("a").to_numpy(),
                  tbl.column("b").to_numpy(), n))})

    wedges = hash_partition_apply(oriented, ["a"], wedge_part,
                                  num_partitions=P)
    keys_ds = oriented.map_batches(edge_keys, batch_format="pyarrow",
                                   batch_size=cfg.batch_size)
    matched = hash_semi_join(wedges, keys_ds, on="key", num_partitions=P)
    credits = matched.map_batches(_wedge_credit_packed(n),
                                  batch_format="pyarrow")
    counts = hash_aggregate(credits, ["v"], [("c", "sum")],
                            num_partitions=P)
    total = int(counts.sum("c") or 0) // 3

    # every vertex with zeros filled: per-dict-block dense ids joined
    # against the counts Dataset
    vd = graph.vdict
    dict_meta = (vd.mins, vd.offsets, vd.block_refs)

    @ray.remote
    def block_vertices(b: int, meta):
        reader = _DictReader(meta)
        lo, hi = int(vd.offsets[b]), int(vd.offsets[b + 1])
        dense = np.arange(lo, hi, dtype=np.int64)
        return pa.table({"v": pa.array(dense),
                         "node": pa.array(reader.to_original(dense))})

    allv = ray.data.from_arrow_refs(
        [block_vertices.remote(b, dict_meta)
         for b in range(len(vd.block_refs))])
    out = hash_lookup_join(allv, counts, "v", "v", {"c": "triangles"},
                           num_partitions=P, outer_fill={"triangles": 0})
    out = out.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "triangles": t.column("triangles").cast(
                                pa.int64())}),
        batch_format="pyarrow")
    if metrics is not None:
        metrics.update({"sec": _time.perf_counter() - t0,
                        "total_triangles": total, "mode": "sharded"})
    return out


def oriented_edges_ds(graph: Graph, cfg: EngineConfig):
    """Materialized Dataset of degree-ordered oriented edges (a, b) —
    broadcast degree vector on dense graphs, co-partitioned degree
    lookup joins on sharded ones (no O(n) driver vector)."""
    import ray

    if not getattr(graph, "sharded", False):
        deg_ref = ray.put(graph.out_degree)

        def orient_batch(batch: pa.Table, _deg_ref=deg_ref) -> pa.Table:
            dg = ray.get(_deg_ref)
            s = batch.column("s").to_numpy()
            d = batch.column("d").to_numpy()
            a, b = _orient(s, d, dg)
            return pa.table({"a": pa.array(a), "b": pa.array(b)})

        return graph.edges.map_batches(orient_batch, batch_format="pyarrow",
                                       batch_size=cfg.batch_size).materialize()

    from centrality_gpu_ray.stages.shuffle import hash_aggregate, hash_lookup_join

    P = cfg.num_partitions

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([t.column("s").to_numpy(),
                            t.column("d").to_numpy()])
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq),
                         "c": pa.array(cnt.astype(np.int64))})

    deg_ds = hash_aggregate(
        graph.edges.map_batches(deg_partial, batch_format="pyarrow"),
        ["v"], [("c", "sum")], num_partitions=P)
    pairs = graph.edges.map_batches(
        lambda t: t.select(["s", "d"]), batch_format="pyarrow")
    with_ds = hash_lookup_join(pairs, deg_ds, "s", "v", {"c": "_deg_s"},
                               num_partitions=P)
    with_dd = hash_lookup_join(with_ds, deg_ds, "d", "v", {"c": "_deg_d"},
                               num_partitions=P)

    def orient_b(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy()
        d = t.column("d").to_numpy()
        gs = t.column("_deg_s").to_numpy()
        gd = t.column("_deg_d").to_numpy()
        swap = (gd < gs) | ((gd == gs) & (d < s))
        return pa.table({"a": pa.array(np.where(swap, d, s)),
                         "b": pa.array(np.where(swap, s, d))})

    return with_dd.map_batches(orient_b, batch_format="pyarrow",
                               batch_size=cfg.batch_size).materialize()


def original_ids_mapper(graph: Graph):
    """Returns f(dense_id_array) → original-id array usable inside
    map_batches tasks: a broadcast node_ids gather on dense graphs, a
    distributed-dictionary reader on sharded ones."""
    import ray

    if not getattr(graph, "sharded", False):
        ids_ref = ray.put(graph.node_ids)

        def to_orig(dense: np.ndarray) -> np.ndarray:
            return ray.get(ids_ref)[dense]

        return to_orig

    from centrality_gpu_ray.pipelines.vertexdict import _DictReader

    meta = (graph.vdict.mins, graph.vdict.offsets, graph.vdict.block_refs)
    reader_box: list = []

    def to_orig(dense: np.ndarray) -> np.ndarray:
        if not reader_box:
            reader_box.append(_DictReader(meta))
        return reader_box[0].to_original(dense.astype(np.int64))

    return to_orig


def _support_counts_ds(oriented, n: int, cfg: EngineConfig):
    """Oriented-edge Dataset → per-packed-edge-key triangle-support
    counts ``(key, c)``: apex-hash wedge generation, packed-key
    semi-join against the edge set, per-triangle 3-edge credits,
    hash-aggregated. Shared by :func:`edge_support` and the k-truss
    peel rounds (``truss.py``) so the kernel can't diverge."""
    from centrality_gpu_ray.stages.shuffle import (hash_aggregate,
                                                   hash_partition_apply,
                                                   hash_semi_join)

    P = cfg.num_partitions

    def wedge_part(tbl: pa.Table) -> pa.Table:
        apex, x, y = _wedges_from_adj(
            tbl.column("a").to_numpy(zero_copy_only=False),
            tbl.column("b").to_numpy(zero_copy_only=False))
        return pa.table({"apex": pa.array(apex),
                         "key": pa.array(_pack(x, y, n))})

    def edge_keys(tbl: pa.Table) -> pa.Table:
        return pa.table({"key": pa.array(
            _pack(tbl.column("a").to_numpy(),
                  tbl.column("b").to_numpy(), n))})

    def tri_edge_credits(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy()
        apex = batch.column("apex").to_numpy()
        xx = key // np.int64(n)
        yy = key % np.int64(n)
        keys3 = np.concatenate([_pack(apex, xx, n), _pack(apex, yy, n), key])
        uniq, cnt = np.unique(keys3, return_counts=True)
        return pa.table({"key": pa.array(uniq),
                         "c": pa.array(cnt.astype(np.int64))})

    wedges = hash_partition_apply(oriented, ["a"], wedge_part,
                                  num_partitions=P)
    keys_ds = oriented.map_batches(edge_keys, batch_format="pyarrow",
                                   batch_size=cfg.batch_size)
    matched = hash_semi_join(wedges, keys_ds, on="key", num_partitions=P)
    return hash_aggregate(matched.map_batches(tri_edge_credits,
                                              batch_format="pyarrow"),
                          ["key"], [("c", "sum")], num_partitions=P)


def edge_support(graph: Graph, config: EngineConfig | None = None,
                 metrics: dict | None = None):
    """Per-edge triangle support: for every canonical edge (src < dst)
    the number of triangles containing it — the k-truss building block
    (an edge is in the k-truss iff support ≥ k−2). Same oriented-wedge
    semi-join as :func:`triangle_counts`, but each matched wedge
    credits its THREE edges (apex–x, apex–y, x–y) instead of its three
    vertices, and the counts aggregate per packed edge key rather than
    per vertex. Returns ``(src, dst, support)`` in original ids
    (zero-support edges included); a ``pa.Table`` in local mode, a
    Dataset otherwise."""
    cfg = config or graph.config
    t0 = time.perf_counter()
    n = graph.num_vertices

    if not getattr(graph, "sharded", False) and graph.mode == "local":
        deg = graph.out_degree
        s, d, _ = graph.local_arrays()
        a, b = _orient(s, d, deg)
        apex, x, y = _wedges_from_adj(a, b)
        canon = _pack(s, d, n)
        order = np.argsort(canon)
        canon_sorted = canon[order]
        support = np.zeros(canon.size, dtype=np.int64)
        if apex.size and canon.size:
            wk = _pack(x, y, n)
            idx = np.minimum(np.searchsorted(canon_sorted, wk),
                             canon_sorted.size - 1)
            match = canon_sorted[idx] == wk
            am, xm, ym = apex[match], x[match], y[match]
            keys3 = np.concatenate([_pack(am, xm, n), _pack(am, ym, n),
                                    wk[match]])
            uniq, cnt = np.unique(keys3, return_counts=True)
            pos = np.searchsorted(canon_sorted, uniq)
            support[order[pos]] = cnt
        if metrics is not None:
            metrics.update({"sec": time.perf_counter() - t0, "mode": "local"})
        return pa.table({
            "src": pa.array(graph.node_ids[s], type=pa.int64()),
            "dst": pa.array(graph.node_ids[d], type=pa.int64()),
            "support": pa.array(support),
        })

    from centrality_gpu_ray.stages.shuffle import hash_lookup_join

    P = cfg.num_partitions
    oriented = oriented_edges_ds(graph, cfg)
    sup = _support_counts_ds(oriented, n, cfg)

    to_orig = original_ids_mapper(graph)

    def canon_rows(batch: pa.Table, _to_orig=to_orig) -> pa.Table:
        s = batch.column("s").to_numpy()
        d = batch.column("d").to_numpy()
        return pa.table({"key": pa.array(_pack(s, d, n)),
                         "src": pa.array(_to_orig(s), type=pa.int64()),
                         "dst": pa.array(_to_orig(d), type=pa.int64())})

    canon_ds = graph.edges.map_batches(canon_rows, batch_format="pyarrow",
                                       batch_size=cfg.batch_size)
    out = hash_lookup_join(canon_ds, sup, "key", "key", {"c": "support"},
                           num_partitions=P, outer_fill={"support": 0})
    out = out.map_batches(
        lambda t: pa.table({"src": t.column("src"), "dst": t.column("dst"),
                            "support": t.column("support").cast(pa.int64())}),
        batch_format="pyarrow")
    if metrics is not None:
        metrics.update({"sec": time.perf_counter() - t0, "mode": graph.mode})
    return out


def _wedge_credit_packed(n: int):
    """Credit apex + both endpoints of each matched (packed) wedge."""

    def fn(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy()
        v = np.concatenate([batch.column("apex").to_numpy(),
                            key // np.int64(n), key % np.int64(n)])
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq),
                         "c": pa.array(cnt.astype(np.int64))})

    return fn


def clustering_coefficients(graph: Graph,
                            config: EngineConfig | None = None,
                            metrics: dict | None = None):
    """Local clustering coefficients — ``(node, triangles,
    clustering)`` with ``clustering = triangles(v) / C(deg(v), 2)``
    (0 where deg < 2). Derived from :func:`triangle_counts` plus the
    degree vector; ``metrics`` gains ``avg_clustering`` (mean over
    all vertices — Watts–Strogatz) and ``transitivity`` (global
    3·triangles / wedges). Dense graphs return a ``pa.Table``;
    sharded graphs compute the degree attach distributed
    (hash-aggregated degrees + one lookup join) and return a Dataset,
    with the two scalar metrics folded from per-block partials."""
    cfg = config or graph.config
    tri = triangle_counts(graph, cfg, metrics=metrics)
    if isinstance(tri, pa.Table):
        deg = graph.out_degree.astype(np.float64)
        t = tri.column("triangles").to_numpy().astype(np.float64)
        poss = deg * (deg - 1.0) / 2.0
        c = np.divide(t, poss, out=np.zeros_like(t), where=poss > 0)
        if metrics is not None:
            metrics.update({
                "avg_clustering": float(c.mean()) if c.size else 0.0,
                "transitivity": (float(t.sum() / poss.sum())
                                 if poss.sum() > 0 else 0.0),
            })
        return tri.append_column("clustering", pa.array(c))

    from centrality_gpu_ray.stages.shuffle import (hash_aggregate,
                                                   hash_lookup_join)

    def explode_deg(tb: pa.Table) -> pa.Table:
        s = tb.column("src").to_numpy()
        d = tb.column("dst").to_numpy()
        return pa.table({
            "node": pa.array(np.concatenate([s, d]).astype(np.int64)),
            "c": pa.array(np.ones(2 * len(tb), dtype=np.int64))})

    deg_ds = hash_aggregate(
        graph.canonical_edges().map_batches(explode_deg,
                                            batch_format="pyarrow"),
        keys=["node"], aggs=[("c", "sum")],
        num_partitions=cfg.num_partitions)
    joined = hash_lookup_join(tri, deg_ds, row_key="node",
                              dict_key="node", attach={"c": "deg"},
                              outer_fill={"deg": 0},
                              num_partitions=cfg.num_partitions)

    def finish(tb: pa.Table) -> pa.Table:
        t = tb.column("triangles").to_numpy().astype(np.float64)
        dg = tb.column("deg").to_numpy().astype(np.float64)
        poss = dg * (dg - 1.0) / 2.0
        c = np.divide(t, poss, out=np.zeros_like(t), where=poss > 0)
        return pa.table({"node": tb.column("node"),
                         "triangles": tb.column("triangles"),
                         "clustering": pa.array(c)})

    out = joined.map_batches(finish, batch_format="pyarrow")
    if metrics is not None:
        out = out.materialize()
        # scalar folds for the two global metrics (one tiny row per
        # block to the driver)
        sums = joined.map_batches(
            lambda tb: pa.table({
                "t": pa.array([float(tb.column("triangles").to_numpy()
                               .sum())]),
                "p": pa.array([float((lambda g: (g * (g - 1) / 2.0)
                                      .sum())(
                    tb.column("deg").to_numpy().astype(np.float64)))]),
                "csum": pa.array([float(np.divide(
                    tb.column("triangles").to_numpy()
                    .astype(np.float64),
                    (lambda g: g * (g - 1) / 2.0)(
                        tb.column("deg").to_numpy()
                        .astype(np.float64)),
                    out=np.zeros(len(tb)),
                    where=tb.column("deg").to_numpy() > 1).sum())]),
                "n": pa.array([float(len(tb))]),
            }), batch_format="pyarrow")
        tt = pp = cs = nn = 0.0
        for b in sums.iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
            tt += float(b.column("t").to_numpy().sum())
            pp += float(b.column("p").to_numpy().sum())
            cs += float(b.column("csum").to_numpy().sum())
            nn += float(b.column("n").to_numpy().sum())
        metrics.update({
            "avg_clustering": cs / nn if nn else 0.0,
            "transitivity": tt / pp if pp else 0.0,
        })
    return out
