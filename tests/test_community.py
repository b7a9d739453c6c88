"""Modularity over (node, label) partitions: hand-computed case,
DuckDB parity on a random graph, weighted parity, labelprop wiring."""
import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from centrality_gpu_ray.pipelines.community import (community_stats,
                                                    modularity_score)


def _ds(tbl: pa.Table):
    return ray.data.from_arrow(tbl).repartition(3)


def _stats_dict(stats):
    out = {}
    for b in stats.iter_batches(batch_size=None, batch_format="pyarrow"):
        for c, i2, dg in zip(b.column("community").to_pylist(),
                             b.column("intra2").to_pylist(),
                             b.column("deg_sum").to_pylist()):
            assert c not in out
            out[c] = (i2, dg)
    return out


def test_two_triangles_hand_case(ray_session):
    # triangles {0,1,2} and {3,4,5} + bridge 2-3: the textbook
    # Q = 70/196 = 0.357142857…
    edges = pa.table({
        "src": pa.array([0, 0, 1, 3, 3, 4, 2], type=pa.int64()),
        "dst": pa.array([1, 2, 2, 4, 5, 5, 3], type=pa.int64())})
    labels = pa.table({"node": pa.array(range(6), type=pa.int64()),
                       "label": pa.array([0, 0, 0, 1, 1, 1],
                                         type=pa.int64())})
    stats = community_stats(_ds(edges), labels)
    assert _stats_dict(stats) == {0: (6, 7), 1: (6, 7)}
    score = modularity_score(stats)
    assert score == {"m2": 14, "q_num": 70, "communities": 2,
                     "q_micro": 357143}


def _random_canonical_edges(seed: int, n: int = 40, m: int = 200,
                            weights: bool = False) -> pa.Table:
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, size=m)
    d = rng.integers(0, n, size=m)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    uniq = np.unique(lo * n + hi)
    t = {"src": pa.array((uniq // n).astype(np.int64)),
         "dst": pa.array((uniq % n).astype(np.int64))}
    if weights:
        t["weight"] = pa.array(
            rng.integers(1, 9, size=uniq.size).astype(np.int64))
    return pa.table(t)


def test_matches_duckdb(ray_session):
    edges = _random_canonical_edges(3)
    n = 40
    labels = pa.table({"node": pa.array(range(n), type=pa.int64()),
                       "label": pa.array([i % 5 for i in range(n)],
                                         type=pa.int64())})
    got = _stats_dict(community_stats(_ds(edges), labels))
    con = duckdb.connect()
    con.register("edges", edges.to_pandas())
    con.register("labels", labels.to_pandas())
    want = con.sql("""
        WITH le AS (
            SELECT ls.label AS cs, ld.label AS cd FROM edges e
            JOIN labels ls ON ls.node = e.src
            JOIN labels ld ON ld.node = e.dst),
        intra AS (SELECT cs AS c, 2 * COUNT(*) AS i2 FROM le
                  WHERE cs = cd GROUP BY cs),
        degs AS (
            SELECT l.label AS c, COUNT(*) AS dg
            FROM (SELECT src AS nd FROM edges
                  UNION ALL SELECT dst FROM edges) x
            JOIN labels l ON l.node = x.nd GROUP BY l.label)
        SELECT d.c, COALESCE(i.i2, 0) AS i2, d.dg
        FROM degs d LEFT JOIN intra i ON i.c = d.c""").df()
    want_d = {int(r.c): (int(r.i2), int(r.dg))
              for r in want.itertuples()}
    assert got == want_d


def test_weighted_serial_parity(ray_session):
    edges = _random_canonical_edges(9, weights=True)
    n = 40
    lab = np.array([i % 4 for i in range(n)], dtype=np.int64)
    labels = pa.table({"node": pa.array(range(n), type=pa.int64()),
                       "label": pa.array(lab)})
    stats = community_stats(_ds(edges), labels, weighted=True)
    got = modularity_score(stats)
    # serial oracle
    s = edges.column("src").to_numpy()
    d = edges.column("dst").to_numpy()
    w = edges.column("weight").to_numpy()
    m2 = int(2 * w.sum())
    k = len(np.unique(lab))
    intra2 = np.zeros(k, dtype=np.int64)
    np.add.at(intra2, lab[s], np.where(lab[s] == lab[d], 2 * w, 0))
    deg = np.zeros(k, dtype=np.int64)
    np.add.at(deg, lab[s], w)
    np.add.at(deg, lab[d], w)
    q_num = int(sum(int(m2) * int(a) - int(b) ** 2
                    for a, b in zip(intra2, deg)))
    assert got["m2"] == m2 and got["q_num"] == q_num
    assert got["communities"] == k


def test_labelprop_partition_scores(ray_session):
    """End-to-end wiring: score the labelprop partition of a two-clique
    graph — communities must be the cliques and Q must be positive."""
    from centrality_gpu_ray.pipelines.graph import Graph
    from centrality_gpu_ray.pipelines.labelprop import label_propagation

    rows_s, rows_d = [], []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                rows_s.append(base + i)
                rows_d.append(base + j)
    rows_s.append(4)
    rows_d.append(10)
    edges = pa.table({"src": pa.array(rows_s, type=pa.int64()),
                      "dst": pa.array(rows_d, type=pa.int64())})
    g = Graph(_ds(edges))
    labels = label_propagation(g)
    stats = community_stats(g.canonical_edges(), labels)
    score = modularity_score(stats)
    assert score["communities"] == 2
    assert score["q_micro"] > 300000


def test_partial_labels_raise(ray_session):
    import pytest

    edges = pa.table({"src": pa.array([0, 1], type=pa.int64()),
                      "dst": pa.array([1, 2], type=pa.int64())})
    labels = pa.table({"node": pa.array([0, 1], type=pa.int64()),
                       "label": pa.array([0, 0], type=pa.int64())})
    with pytest.raises(Exception, match="cover every edge endpoint"):
        _stats_dict(community_stats(_ds(edges), labels))


def test_community_stats_rejects_duplicate_node_labels(ray_session):
    import pytest as _pytest
    import ray.data as _rd

    from centrality_gpu_ray.pipelines.community import community_stats

    edges = _rd.from_arrow(pa.table({
        "src": pa.array([1, 2], type=pa.int64()),
        "dst": pa.array([2, 3], type=pa.int64())}))
    labels = pa.table({
        "node": pa.array([1, 2, 2, 3], type=pa.int64()),
        "label": pa.array([0, 0, 1, 1], type=pa.int64())})
    with _pytest.raises(Exception, match="multiple rows"):
        community_stats(edges, labels).to_pandas()
