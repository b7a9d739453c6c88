"""GraphSAGE-style neighbor sampling: fanout bounds, determinism,
full-coverage under large fanouts, dense↔sharded parity."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.gnn_sampling import neighbor_sample
from centrality_gpu_ray.pipelines.graph import Graph


def _edges(seed=2, n=80, m=400):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    keep = s != d
    return pa.table({"src": pa.array((s[keep] * 5 + 2).astype(np.int64)),
                     "dst": pa.array((d[keep] * 5 + 2).astype(np.int64))})


def _nbrs(tbl):
    out: dict = {}
    for a, b in zip(tbl.column("src").to_pylist(),
                    tbl.column("dst").to_pylist()):
        out.setdefault(a, set()).add(b)
        out.setdefault(b, set()).add(a)
    return out


def test_fanout_bounds_and_layer_chain(ray_session):
    tbl = _edges()
    g = Graph(ray.data.from_arrow(tbl), config=EngineConfig())
    seeds = [2, 7, 12]
    m = {}
    out = neighbor_sample(g, seeds, fanouts=(3, 2), seed=1,
                          metrics=m).to_pandas()
    nbrs = _nbrs(tbl)
    l0 = out[out["layer"] == 0]
    l1 = out[out["layer"] == 1]
    # fanout bound per source, sampled edges are real edges
    for lv, f in ((l0, 3), (l1, 2)):
        per_src = lv.groupby("src")["dst"].nunique()
        assert (per_src <= f).all()
        for a, b in zip(lv["src"], lv["dst"]):
            assert b in nbrs[a]
    # layer chaining: layer-1 sources = layer-0 destinations
    assert set(l1["src"]) <= set(l0["dst"])
    assert set(l0["src"]) <= set(seeds)
    assert m["edges_sampled"] == len(out)


def test_large_fanout_covers_whole_neighborhood(ray_session):
    tbl = _edges(seed=5)
    g = Graph(ray.data.from_arrow(tbl), config=EngineConfig())
    nbrs = _nbrs(tbl)
    seed_node = max(nbrs, key=lambda v: len(nbrs[v]))
    out = neighbor_sample(g, [seed_node], fanouts=(10_000,),
                          seed=0).to_pandas()
    assert set(out["dst"]) == nbrs[seed_node]


def test_deterministic_and_seed_sensitivity(ray_session):
    tbl = _edges(seed=9)
    g = Graph(ray.data.from_arrow(tbl), config=EngineConfig())
    a = neighbor_sample(g, [2, 37], fanouts=(4, 3), seed=3).to_pandas()
    b = neighbor_sample(g, [2, 37], fanouts=(4, 3), seed=3).to_pandas()
    assert a.equals(b)
    c = neighbor_sample(g, [2, 37], fanouts=(4, 3), seed=4).to_pandas()
    assert not a.equals(c)


def test_sharded_matches_dense(ray_session):
    tbl = _edges(seed=13)
    dense = Graph(ray.data.from_arrow(tbl), config=EngineConfig())
    sharded = Graph(ray.data.from_arrow(tbl),
                    config=EngineConfig(dense_vertex_limit=10))
    assert sharded.sharded
    seeds = [2, 52, 107]
    md, ms = {}, {}
    a = neighbor_sample(dense, seeds, fanouts=(3, 2), seed=7,
                        metrics=md).to_pandas()
    b = neighbor_sample(sharded, seeds, fanouts=(3, 2), seed=7,
                        metrics=ms).to_pandas()
    assert ms["mode"] == "sharded"
    key = ["layer", "src", "dst"]
    assert sorted(map(tuple, a[key].values.tolist())) \
        == sorted(map(tuple, b[key].values.tolist()))


def test_unknown_seed_rejected(ray_session):
    tbl = _edges()
    g = Graph(ray.data.from_arrow(tbl), config=EngineConfig())
    with pytest.raises(ValueError, match="not in graph"):
        neighbor_sample(g, [999_999], fanouts=(2,))
    g2 = Graph(ray.data.from_arrow(tbl),
               config=EngineConfig(dense_vertex_limit=10))
    with pytest.raises(ValueError, match="not in graph"):
        neighbor_sample(g2, [999_999], fanouts=(2,))
