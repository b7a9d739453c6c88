"""HITS (hubs & authorities) over a DIRECTED edge table, via the
bipartite double cover.

The reference engine computes only undirected centralities (its BFS
symmetrizes every input, ``modified_apsp.cpp:273-363``), so directed
link analysis is an engine extension — but one that deliberately
REUSES the whole undirected superstep machinery instead of growing a
second (directed-CSR) gather path:

Every directed edge ``(u, v)`` becomes the undirected double-cover
edge ``(2u, 2v+1)``: even ids are "out-role" (hub) copies, odd ids are
"in-role" (authority) copies.  On the double cover the adjacency is
the bipartite block matrix ``[[0, A], [Aᵀ, 0]]``, so ONE step of the
existing undirected gather computes ``h' = A·a`` on the even side and
``a' = Aᵀ·h`` on the odd side simultaneously — which is exactly the
simultaneous-update HITS recurrence.  Power iteration on the double
cover therefore IS HITS, and it inherits, untouched, every scale
property of the eigenvector/PageRank path: dense broadcast mode below
``dense_vertex_limit``, owner-sharded resident state above it, one
gather + one global sum per superstep, O(P) driver scalars.

Normalization equivalence (why joint L1 normalization is enough):
classic HITS normalizes h and a separately each round.  With the
simultaneous update, h_{t+1} depends only on a_t and a_{t+1} only on
h_t, so scaling each side by ANY per-round constant never mixes into
the other side's trajectory — per-side values after t rounds differ
from the jointly-normalized run by one global per-side constant.  A
single per-side L1 normalization at the END therefore reproduces the
per-round-normalized fixed-step result exactly (in exact arithmetic;
in float64 the difference is ~1e-15 relative, far below the nano-unit
rounding emitted here).  The SQL oracle mirrors the joint-normalized
recurrence literally, so the driver check does not even rely on this
argument.

Output is integer nano-units (``floor(x·1e9 + 0.5)``) like the
eigenvector row, so the driver can value-hash it against DuckDB.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.eigenvector import eigenvector_centrality
from centrality_gpu_ray.pipelines.graph import Graph

_SIDE = pa.array(["hub", "auth"], type=pa.string())


def _double_cover(edges_ds):
    """Directed (src, dst) rows → undirected double-cover edge table
    (2·src, 2·dst+1, weight 1).  Ids must fit 62 bits (doubling cannot
    overflow int64) — true for every id family the engine mints
    (sha256-prefix ids are 61-bit by construction, relational keys are
    small ints)."""

    def dc(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64)
        d = t.column("dst").to_numpy().astype(np.int64)
        if s.size and (int(s.max(initial=0)) >= 1 << 62
                       or int(d.max(initial=0)) >= 1 << 62
                       or int(s.min(initial=0)) < 0
                       or int(d.min(initial=0)) < 0):
            raise ValueError("hits_fixed: node ids must be in [0, 2^62)")
        return pa.table({
            "src": pa.array(s * 2),
            "dst": pa.array(d * 2 + 1),
            "weight": pa.array(np.ones(s.size, dtype=np.int64)),
        })

    return edges_ds.map_batches(dc, batch_format="pyarrow")


def _finalize_dense(tbl: pa.Table) -> pa.Table:
    node = tbl.column("node").to_numpy()
    x = tbl.column("eigenvector").to_numpy()
    par = (node & 1).astype(np.int64)
    side_sum = np.zeros(2, dtype=np.float64)
    np.add.at(side_sum, par, x)
    score = x / np.where(side_sum[par] > 0.0, side_sum[par], 1.0)
    out = pa.table({
        "node": pa.array(node >> 1),
        "side": _SIDE.take(pa.array(par)),
        "hits_nano": pa.array(np.floor(score * 1e9 + 0.5).astype(np.int64)),
    })
    # match the sharded path's string sort: 'auth' (par=1) before 'hub'
    order = np.lexsort((node >> 1, 1 - par))
    return out.take(pa.array(order))


def _finalize_dataset(ds):
    """Sharded path: per-side sums via one per-block partial pass
    (O(blocks) driver scalars), then a stateless normalize map."""

    def partial(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy()
        x = t.column("eigenvector").to_numpy()
        par = (node & 1).astype(np.int64)
        s = np.zeros(2, dtype=np.float64)
        np.add.at(s, par, x)
        return pa.table({"even": pa.array([s[0]]), "odd": pa.array([s[1]])})

    sums = np.zeros(2, dtype=np.float64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        sums[0] += b.column("even").to_numpy().sum()
        sums[1] += b.column("odd").to_numpy().sum()
    # two scalars — ship in the closure, no broadcast object needed
    safe_sums = np.where(sums > 0.0, sums, 1.0)

    def norm(t: pa.Table, ss=safe_sums) -> pa.Table:
        node = t.column("node").to_numpy()
        x = t.column("eigenvector").to_numpy()
        par = (node & 1).astype(np.int64)
        score = x / ss[par]
        return pa.table({
            "node": pa.array(node >> 1),
            "side": _SIDE.take(pa.array(par)),
            "hits_nano": pa.array(
                np.floor(score * 1e9 + 0.5).astype(np.int64)),
        })

    return ds.map_batches(norm, batch_format="pyarrow").sort(["side", "node"])


def hits_fixed(edges_ds, supersteps: int = 12,
               config: EngineConfig | None = None, mode: str = "auto",
               metrics: dict | None = None):
    """HITS over a directed ``(src, dst)`` edge Dataset for exactly
    ``supersteps`` rounds (simultaneous update, uniform init over the
    double cover, per-side L1-normalized output).

    Returns ``(node, side, hits_nano)`` — ``side`` ∈ {'hub', 'auth'},
    one hub row per distinct source, one auth row per distinct target
    (a node that is both source and target gets both rows), sorted by
    (side, node).  ``pa.Table`` in dense mode, Dataset when the double
    cover exceeds ``dense_vertex_limit``.

    Multi-edges collapse to one unweighted edge (``Graph`` dedups);
    classic HITS over the distinct-edge adjacency.
    """
    cfg = dataclasses.replace(config or EngineConfig(),
                              tolerance=0.0, max_supersteps=supersteps)
    t0 = time.perf_counter()
    g = Graph(_double_cover(edges_ds), config=cfg, mode=mode)
    inner: dict = {}
    scores = eigenvector_centrality(g, config=cfg, metrics=inner)
    out = (_finalize_dense(scores) if isinstance(scores, pa.Table)
           else _finalize_dataset(scores))
    if metrics is not None:
        metrics.update({
            "sec": time.perf_counter() - t0,
            "supersteps": inner.get("supersteps", supersteps),
            "cover_vertices": g.num_vertices,
            "cover_edges": g.num_edges,
            "mode": inner.get("mode", g.mode),
        })
    return out
