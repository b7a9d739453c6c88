"""Sampled approximate diameter (A6)."""

from centrality_gpu_ray.pipelines.bfs import approx_diameter
from centrality_gpu_ray.pipelines.graph import Graph
from centrality_gpu_ray.sources.edgelist import fixture_dataset


def test_approx_diameter_test1():
    g = Graph(fixture_dataset("test1"))
    out = approx_diameter(g, num_samples=9)  # all vertices → exact
    assert out["samples"] == 9
    # test1 eccentricities are 2 or 3 → diameter 3
    assert out["max_depth"] == 3
    assert 2 <= out["median_depth"] <= 3


def test_approx_diameter_deterministic():
    g = Graph(fixture_dataset("test4"))
    a = approx_diameter(g, num_samples=5, seed=7)
    b = approx_diameter(g, num_samples=5, seed=7)
    assert a == b
