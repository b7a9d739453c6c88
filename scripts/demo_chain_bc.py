"""Chain-compressed exact BC at scale — the reference Path C win.

Graph: a road-network-shaped giant biconnected component — a ring of
``A`` anchor vertices with random chords, every core edge subdivided
into an ``L``-interior degree-2 chain (~``A*2.5*L`` chain vertices),
plus pendant paths off anchors (closed-form territory) and a small
separate component.  This is the exact shape the reference's chain
postprocess (``postprocesses.cu:8-203``) targets: almost every vertex
sits on a chain, so plain per-BCC Brandes pays ~n full sweeps while
the compressed path pays ``A + 2*chains`` sweeps + closed forms.

Measured A/B, no estimates pulled from air:
* exact parity compressed-vs-plain on a scaled-down instance,
* the full-size compressed run (wall seconds, real result),
* the full-size PLAIN per-source rate measured on a 512-source sample
  of the same graph (same kernel the uncompressed path would run), and
  the projected full plain time = n / measured rate.

Run: ``python scripts/demo_chain_bc.py`` (owns its Ray session).
Sizing via GRAFT_CHAIN_ANCHORS / GRAFT_CHAIN_LEN (default 800 x 125 →
~500k chain vertices in one BCC).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RAY_worker_niceness", "0")

A = int(os.environ.get("GRAFT_CHAIN_ANCHORS", "800"))
L = int(os.environ.get("GRAFT_CHAIN_LEN", "125"))
SAMPLE = int(os.environ.get("GRAFT_CHAIN_SAMPLE", "512"))


def build_edges(a: int, ell: int, seed: int = 7):
    """Ring + chords over ``a`` anchors, every core edge subdivided
    into an ``ell``-interior chain; pendant 3-paths on every 8th
    anchor; one small detached triangle."""
    import numpy as np

    rng = np.random.default_rng(seed)
    ring = [(i, (i + 1) % a) for i in range(a)]
    nch = max(a // 2, 4)
    cu = rng.integers(0, a, nch)
    cv = (cu + rng.integers(2, a - 2, nch)) % a
    chords = [(int(x), int(y)) for x, y in zip(cu, cv) if x != y]
    core = ring + chords
    src, dst = [], []
    nv = a
    for (x, y) in core:
        ids = np.arange(nv, nv + ell, dtype=np.int64)
        nv += ell
        s = np.concatenate([[x], ids])
        d = np.concatenate([ids, [y]])
        src.append(s)
        dst.append(d)
    for host in range(0, a, 8):        # pendant 3-paths (closed forms)
        ids = [nv, nv + 1, nv + 2]
        nv += 3
        src.append(np.array([host, ids[0], ids[1]], dtype=np.int64))
        dst.append(np.array(ids, dtype=np.int64))
    tri = [nv, nv + 1, nv + 2]         # detached component
    nv += 3
    src.append(np.array([tri[0], tri[1], tri[2]], dtype=np.int64))
    dst.append(np.array([tri[1], tri[2], tri[0]], dtype=np.int64))
    return (np.concatenate(src), np.concatenate(dst), nv,
            len(core), len(ring))


def main() -> dict:
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from centrality_gpu_ray.config import EngineConfig
    from centrality_gpu_ray.pipelines.bc_decomp import \
        betweenness_decomposed
    from centrality_gpu_ray.pipelines.brandes import betweenness_centrality
    from centrality_gpu_ray.pipelines.graph import Graph

    def graph_of(s, d):
        tbl = pa.table({"src": pa.array(s), "dst": pa.array(d),
                        "weight": pa.array(np.ones(s.size, np.int64))})
        return Graph(ray.data.from_arrow(tbl), config=EngineConfig())

    out: dict = {"anchors": A, "chain_len": L}

    def _p(msg):
        print(f"[demo_chain_bc] {msg}", file=sys.stderr, flush=True)

    _p("parity gate...")
    # 1) exact parity gate on a scaled-down instance (same topology)
    s0, d0, nv0, _, _ = build_edges(60, 12)
    g0 = graph_of(s0, d0)
    plain0 = betweenness_centrality(g0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    m0: dict = {}
    comp0 = betweenness_decomposed(g0, metrics=m0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert m0["num_bcc_chain_compressed"] >= 1, m0
    np.testing.assert_allclose(comp0["bc"].to_numpy(),
                               plain0["bc"].to_numpy(),
                               rtol=1e-9, atol=1e-9)
    out["parity_gate"] = {"nv": nv0, "ok": True}

    _p("full-size compressed run...")
    # 2) full-size compressed run
    s1, d1, nv1, ncore, _ = build_edges(A, L)
    g1 = graph_of(s1, d1)
    m1: dict = {}
    t0 = time.perf_counter()
    bc = betweenness_decomposed(g1, concurrency=16, metrics=m1)
    comp_sec = time.perf_counter() - t0
    bcv = bc.column("bc").to_numpy()
    assert bcv.size == nv1 and float(np.max(bcv)) > 0.0
    out["full"] = {
        "n_vertices": nv1, "n_edges": int(s1.size),
        "n_chain_vertices": ncore * L,
        "num_bcc_chain_compressed": m1["num_bcc_chain_compressed"],
        "compressed_sec": round(comp_sec, 2),
    }

    _p(f"compressed done in {comp_sec:.1f}s; plain sample...")
    # 3) measured plain rate on the SAME graph (sampled sources through
    #    the plain exact kernel), then the honest projection
    t0 = time.perf_counter()
    betweenness_centrality(g1, concurrency=16, max_sources=SAMPLE)
    samp_sec = time.perf_counter() - t0
    rate = SAMPLE / samp_sec
    plain_proj_sec = nv1 / rate
    out["plain_sample"] = {
        "sources": SAMPLE, "sec": round(samp_sec, 2),
        "sources_per_sec": round(rate, 1),
        "projected_full_plain_sec": round(plain_proj_sec, 1),
    }
    out["speedup_vs_plain_projected"] = round(plain_proj_sec / comp_sec, 1)
    print(json.dumps(out))
    ray.shutdown()
    return out


if __name__ == "__main__":
    main()
