"""Owner-resident (sharded) Jones–Plassmann coloring + MIS parity.

The sharded path keeps resident counters of undecided lower-priority
neighbors (+ neighbor-color sets for coloring) and ships only the
newly-decided vertices per round — it must be round-for-round
bit-identical to the dense paths: splitmix64 priorities are bijective,
so the shard-side hash order IS the dense permutation-rank order, and
counter==0 ⟺ the dense ready/winner predicate."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.coloring import greedy_coloring
from centrality_gpu_ray.pipelines.graph import Graph
from centrality_gpu_ray.pipelines.mis import maximal_independent_set


def _random_edges(seed: int, n: int = 300, m: int = 1200) -> pa.Table:
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, size=m)
    d = rng.integers(0, n, size=m)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    uniq = np.unique(lo * n + hi)
    # sparse original ids so the dictionary actually relabels; add an
    # isolated-ish chain component to cover multi-component rounds
    src = np.concatenate([(uniq // n), np.arange(n + 5, n + 15)])
    dst = np.concatenate([(uniq % n), np.arange(n + 6, n + 16)])
    return pa.table({"src": pa.array(src * 7 + 3),
                     "dst": pa.array(dst * 7 + 3)})


@pytest.fixture(scope="module")
def pair(ray_session):
    tbl = _random_edges(5)
    dense = Graph(ray.data.from_arrow(tbl), config=EngineConfig())
    sharded = Graph(ray.data.from_arrow(tbl),
                    config=EngineConfig(dense_vertex_limit=50))
    assert not dense.sharded and sharded.sharded
    return dense, sharded


@pytest.mark.parametrize("seed", [0, 7])
def test_sharded_coloring_matches_dense(pair, seed):
    dense, sharded = pair
    md, ms = {}, {}
    a = greedy_coloring(dense, seed=seed, metrics=md).to_pandas()
    b = greedy_coloring(sharded, seed=seed, metrics=ms).to_pandas()
    assert ms["mode"] == "sharded"
    assert ms["rounds"] == md["rounds"]
    assert ms["num_colors"] == md["num_colors"]
    merged = a.merge(b, on="node", suffixes=("_d", "_s"))
    assert len(merged) == dense.num_vertices
    assert (merged["color_d"] == merged["color_s"]).all()
    assert (merged["color_round_d"] == merged["color_round_s"]).all()


@pytest.mark.parametrize("seed", [0, 3])
def test_sharded_mis_matches_dense(pair, seed):
    dense, sharded = pair
    md, ms = {}, {}
    a = maximal_independent_set(dense, seed=seed, metrics=md).to_pandas()
    b = maximal_independent_set(sharded, seed=seed,
                                metrics=ms).to_pandas()
    assert ms["mode"] == "sharded"
    assert ms["rounds"] == md["rounds"]
    assert ms["mis_size"] == md["mis_size"]
    merged = a.merge(b, on="node", suffixes=("_d", "_s"))
    assert len(merged) == dense.num_vertices
    assert (merged["in_mis_d"] == merged["in_mis_s"]).all()
    assert (merged["mis_round_d"] == merged["mis_round_s"]).all()


def test_sharded_mis_rejects_sha256_scheme(pair):
    _, sharded = pair
    with pytest.raises(ValueError, match="splitmix"):
        maximal_independent_set(sharded, priority_scheme="sha256")


def test_sharded_coloring_proper(pair):
    # distributed properness: no edge with equal endpoint colors
    _, sharded = pair
    colors = greedy_coloring(sharded, seed=1).to_pandas()
    cmap = dict(zip(colors["node"], colors["color"]))
    edges = sharded.canonical_edges().to_pandas()
    bad = [(u, v) for u, v in zip(edges["src"], edges["dst"])
           if cmap[u] == cmap[v]]
    assert bad == []
