"""Edge normalization, ids, degrees — the stage-level unit tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from centrality_gpu_ray.sources.edgelist import (
    FIXTURE_EDGES, fixture_dataset, fixture_edges_table, parse_edgelist_text)
from centrality_gpu_ray.stages.degrees import degree_histogram, degrees, max_degree_vertex
from centrality_gpu_ray.stages.edges import dedup_edges, normalize_edges, symmetrize
from centrality_gpu_ray.stages.ids import hash_ids_array, mint_dense_ids
from centrality_gpu_ray.pipelines.graph import Graph

from fixtures import GOLDEN_DEGREES


def test_parse_edgelist_roundtrip():
    text = "3 2\n0 1 1\n1 2 1\n"
    t = parse_edgelist_text(text)
    assert t.num_rows == 2
    assert t.column("src").to_pylist() == [0, 1]


def test_dedup_and_symmetrize():
    raw = pa.table({
        "src": pa.array([0, 1, 0, 2, 2], type=pa.int64()),
        "dst": pa.array([1, 0, 1, 2, 3], type=pa.int64()),  # dup(0,1)x3, self-loop(2,2)
        "weight": pa.array([1, 1, 1, 1, 5], type=pa.int64()),
    })
    ds = ray.data.from_arrow(raw)
    deduped = dedup_edges(ds).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert deduped.values.tolist() == [[0, 1, 3], [2, 3, 5]]
    sym = symmetrize(dedup_edges(ds)).to_pandas()
    assert len(sym) == 4
    assert set(map(tuple, sym[["src", "dst"]].values.tolist())) == {
        (0, 1), (1, 0), (2, 3), (3, 2)}


@pytest.mark.parametrize("name", ["test1", "test3"])
def test_degrees_match_golden(name):
    ds = fixture_dataset(name)
    sym = normalize_edges(ds)
    deg = degrees(sym).to_pandas()
    got = dict(zip(deg["node"], deg["degree"]))
    assert got == GOLDEN_DEGREES[name]


def test_degree_histogram_and_root():
    ds = fixture_dataset("test1")
    sym = normalize_edges(ds)
    hist = degree_histogram(sym).to_pandas()
    got = dict(zip(hist["degree"], hist["num_nodes"]))
    assert got == {2: 5, 3: 2, 4: 2}
    node, deg = max_degree_vertex(sym)
    assert (node, deg) == (3, 4)  # min id among the two degree-4 vertices


def test_hash_ids_deterministic_and_distinct():
    keys = [f"repo:org{i}/r{i}" for i in range(1000)]
    a = hash_ids_array(np.asarray(keys, dtype=object))
    b = hash_ids_array(np.asarray(keys, dtype=object))
    assert np.array_equal(a, b)
    assert np.unique(a).size == 1000
    assert (a >= 0).all()


def test_mint_dense_ids_sorted_rank():
    ds = ray.data.from_arrow(pa.table({"k": pa.array(["c", "a", "b", "a", "c"])}))
    out = mint_dense_ids(ds, "k").to_pandas().sort_values("k")
    assert dict(zip(out["k"], out["id"])) == {"a": 0, "b": 1, "c": 2}


def test_graph_dense_relabel_and_counts():
    g = Graph(fixture_dataset("test1"))
    assert g.num_vertices == 9
    assert g.num_edges == 12
    assert np.array_equal(g.node_ids, np.arange(9))
    deg = g.out_degree
    assert dict(enumerate(deg.tolist())) == GOLDEN_DEGREES["test1"]


def test_graph_noncontiguous_ids():
    # same structure as test1 but ids multiplied by 10 — relabel must be
    # order-preserving and results must map back
    pairs = FIXTURE_EDGES["test1"]
    t = pa.table({
        "src": pa.array([u * 10 for u, _ in pairs], type=pa.int64()),
        "dst": pa.array([v * 10 for _, v in pairs], type=pa.int64()),
        "weight": pa.array([1] * len(pairs), type=pa.int64()),
    })
    g = Graph(ray.data.from_arrow(t))
    assert g.num_vertices == 9
    assert g.node_ids.tolist() == [i * 10 for i in range(9)]
