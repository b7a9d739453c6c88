"""Clustering-coefficient operator: brute-force per-vertex oracle,
dense + sharded parity, global metrics."""

import numpy as np
import pyarrow as pa
import ray.data

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.graph import Graph

def test_clustering_coefficients_vs_oracle(ray_session):
    """Local clustering vs a brute-force per-vertex oracle, dense and
    sharded paths + the two global metrics."""
    import itertools

    from centrality_gpu_ray.pipelines.triangles import \
        clustering_coefficients

    rng = np.random.default_rng(4)
    n = 30
    s = rng.integers(0, n, 120)
    d = rng.integers(0, n, 120)
    keep = s != d
    tbl = pa.table({"src": pa.array((s[keep] * 3).astype(np.int64)),
                    "dst": pa.array((d[keep] * 3).astype(np.int64))})
    g = Graph(ray.data.from_arrow(tbl), config=EngineConfig())
    m = {}
    out = clustering_coefficients(g, metrics=m)
    pdf = out.to_pandas().set_index("node")

    nbrs: dict = {}
    for a, b in zip(tbl.column("src").to_pylist(),
                    tbl.column("dst").to_pylist()):
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    cs = []
    for v, nb in nbrs.items():
        k = len(nb)
        tri = sum(1 for a, b in itertools.combinations(sorted(nb), 2)
                  if b in nbrs.get(a, ()))
        c = tri / (k * (k - 1) / 2) if k > 1 else 0.0
        cs.append(c)
        assert pdf.loc[v, "triangles"] == tri
        assert abs(pdf.loc[v, "clustering"] - c) < 1e-12
    assert abs(m["avg_clustering"] - np.mean(cs)) < 1e-12
    assert 0.0 <= m["transitivity"] <= 1.0

    # sharded path agrees
    g2 = Graph(ray.data.from_arrow(tbl),
               config=EngineConfig(dense_vertex_limit=5))
    assert g2.sharded
    m2 = {}
    p2 = clustering_coefficients(g2, metrics=m2).to_pandas() \
        .set_index("node")
    for v in nbrs:
        assert abs(p2.loc[v, "clustering"]
                   - pdf.loc[v, "clustering"]) < 1e-12
    assert abs(m2["avg_clustering"] - m["avg_clustering"]) < 1e-12
    assert abs(m2["transitivity"] - m["transitivity"]) < 1e-12
