"""Shared residual-localization helper: gate count + collected
residual must match a direct driver-side computation, in both the
plain (MIS) and decided-values (coloring) shapes."""

import numpy as np
import pyarrow as pa
import ray.data

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.graph import Graph
from centrality_gpu_ray.pipelines.localize import (collect_induced,
                                                   induced_edge_count)


def _graph(ray_session):
    rng = np.random.default_rng(2)
    n, m = 60, 240
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    keep = s != d
    t = pa.table({"src": pa.array(s[keep] * 5 + 1),
                  "dst": pa.array(d[keep] * 5 + 1)})
    return Graph(ray.data.from_arrow(t).repartition(3),
                 config=EngineConfig(), mode="distributed")


def test_gate_and_plain_collection(ray_session):
    g = _graph(ray_session)
    s, d, _ = g.local_arrays()
    rng = np.random.default_rng(5)
    mask = rng.random(g.num_vertices) < 0.4
    want = int((mask[s] & mask[d]).sum())
    assert induced_edge_count(g, g.config, mask) == want
    cs, cd = collect_induced(g, g.config, mask)
    got = set(zip(cs.tolist(), cd.tolist()))
    exp = set(zip(s[mask[s] & mask[d]].tolist(),
                  d[mask[s] & mask[d]].tolist()))
    assert got == exp


def test_collection_with_decided_values(ray_session):
    g = _graph(ray_session)
    s, d, _ = g.local_arrays()
    n = g.num_vertices
    rng = np.random.default_rng(9)
    colors = np.where(rng.random(n) < 0.5, rng.integers(0, 4, n), -1)
    mask = colors < 0
    cs, cd, bv, bc = collect_induced(g, g.config, mask,
                                     decided_values=colors)
    assert set(zip(cs.tolist(), cd.tolist())) == set(
        zip(s[mask[s] & mask[d]].tolist(), d[mask[s] & mask[d]].tolist()))
    # boundary = DISTINCT (uncolored vertex, colored-neighbor color)
    exp = set()
    for a, b in zip(s, d):
        if mask[b] and colors[a] >= 0:
            exp.add((int(b), int(colors[a])))
        if mask[a] and colors[b] >= 0:
            exp.add((int(a), int(colors[b])))
    assert set(zip(bv.tolist(), bc.tolist())) == exp
