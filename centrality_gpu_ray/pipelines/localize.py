"""Shared residual-localization tail for round-based dense operators.

MIS and JP coloring (and any future round-based symmetry-breaking
operator) share the same tail-round optimization: the first rounds
decide most vertices, after which every distributed round would still
stream the WHOLE edge set for a tiny undecided residue. Since the
remaining rounds are a pure function of the undecided-INDUCED subgraph
(plus, for coloring, the fixed boundary values of already-decided
neighbors), collecting that residual once it is small and continuing
the identical round loop on driver arrays yields bit-identical output
at driver-array cost. This module is the ONE implementation of that
gate + collection (it used to live as three near-identical copies —
round-4 advice #7)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.config import EngineConfig

# localize once the undecided-induced subgraph fits this many edges
LOCAL_FINISH_EDGES = 4_000_000


def induced_edge_count(graph, cfg: EngineConfig,
                       mask: np.ndarray) -> int:
    """Number of edges with BOTH endpoints in ``mask`` — the localize
    gate, one counting pass (scalar per block to the driver)."""
    import ray

    mask_ref = ray.put(mask)

    def cnt(t: pa.Table, _ref=mask_ref) -> pa.Table:
        m = ray.get(_ref)
        s = t.column("s").to_numpy()
        d = t.column("d").to_numpy()
        return pa.table({"c": pa.array(
            [int((m[s] & m[d]).sum())], type=pa.int64())})

    total = 0
    for b in graph.edges.map_batches(
            cnt, batch_format="pyarrow",
            batch_size=cfg.batch_size).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        total += int(b.column("c").to_numpy().sum())
    return total


def collect_induced(graph, cfg: EngineConfig, mask: np.ndarray,
                    decided_values: np.ndarray | None = None):
    """Collect the mask-induced edge arrays in one pass.

    Without ``decided_values``: returns ``(s, d)`` (the MIS shape).
    With it (per-vertex values, decided ⟺ value ≥ 0): additionally
    returns the DEDUPED boundary pairs ``(bv, bval)`` — mask vertices
    with the values of their decided neighbors (the coloring shape;
    per-block dedup bounds the boundary volume on hub-heavy graphs)."""
    import ray

    state_ref = ray.put((mask, decided_values))
    nmod = np.int64(mask.size) + 1

    def pick(t: pa.Table, _ref=state_ref) -> pa.Table:
        m, vals = ray.get(_ref)
        s = t.column("s").to_numpy()
        d = t.column("d").to_numpy()
        keep = m[s] & m[d]
        cols = {
            "a": np.asarray(s[keep], dtype=np.int64),
            "b": np.asarray(d[keep], dtype=np.int64),
            "kind": np.zeros(int(keep.sum()), dtype=np.int8),
        }
        if vals is not None:
            dec = vals >= 0
            m1 = m[d] & dec[s]
            m2 = m[s] & dec[d]
            bv = np.concatenate([d[m1], s[m2]])
            bc = np.concatenate([vals[s[m1]], vals[d[m2]]])
            if bv.size:
                uniq = np.unique(bv * nmod + bc + 1)
                bv = uniq // nmod
                bc = uniq % nmod - 1
            cols["a"] = np.concatenate([cols["a"], bv.astype(np.int64)])
            cols["b"] = np.concatenate([cols["b"], bc.astype(np.int64)])
            cols["kind"] = np.concatenate(
                [cols["kind"], np.ones(bv.size, dtype=np.int8)])
        return pa.table({k: pa.array(v) for k, v in cols.items()})

    ss, dd, bvs, bcs = [], [], [], []
    for b in graph.edges.map_batches(
            pick, batch_format="pyarrow",
            batch_size=cfg.batch_size).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        a = b.column("a").to_numpy()
        bb = b.column("b").to_numpy()
        kind = b.column("kind").to_numpy()
        e = kind == 0
        ss.append(a[e])
        dd.append(bb[e])
        bvs.append(a[~e])
        bcs.append(bb[~e])
    cat = (lambda xs: np.concatenate(xs) if xs
           else np.empty(0, np.int64))
    if decided_values is None:
        return cat(ss), cat(dd)
    return cat(ss), cat(dd), cat(bvs), cat(bcs)
