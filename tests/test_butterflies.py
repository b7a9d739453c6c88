"""Bipartite butterfly counting: biclique closed forms, DuckDB parity,
multi-edge collapse, side selection."""
import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from centrality_gpu_ray.pipelines.butterflies import butterfly_count


def _ds(l, r, parts=3):
    return ray.data.from_arrow(pa.table({
        "src": pa.array(np.asarray(l, dtype=np.int64)),
        "dst": pa.array(np.asarray(r, dtype=np.int64))})).repartition(parts)


def _count(ds, metrics=None) -> int:
    t = butterfly_count(ds, metrics=metrics)
    return int(t.column("butterflies")[0].as_py())


def test_biclique_closed_forms(ray_session):
    # K_{2,2} = 1 butterfly; K_{2,3} = 3; K_{3,3} = C(3,2)^2 = 9
    for nl, nr, want in ((2, 2, 1), (2, 3, 3), (3, 3, 9)):
        l = np.repeat(np.arange(nl), nr)
        r = np.tile(np.arange(100, 100 + nr), nl)
        assert _count(_ds(l, r)) == want, (nl, nr)


def test_matches_duckdb(ray_session):
    rng = np.random.default_rng(5)
    l = rng.integers(0, 60, 800)
    r = rng.integers(1000, 1030, 800)
    m = {}
    got = _count(_ds(l, r), metrics=m)
    con = duckdb.connect()
    con.register("raw", pa.table({"l": pa.array(l.astype(np.int64)),
                                  "r": pa.array(r.astype(np.int64))
                                  }).to_pandas())
    want = con.sql("""
        WITH e AS (SELECT DISTINCT l, r FROM raw),
        w AS (SELECT e1.r AS a, e2.r AS b, COUNT(*) AS c
              FROM e e1 JOIN e e2 ON e1.l = e2.l AND e1.r < e2.r
              GROUP BY 1, 2)
        SELECT COALESCE(SUM(c * (c - 1) // 2), 0) AS bf FROM w""").df()
    assert got == int(want["bf"][0])
    # 60 lefts x deg ~13 vs 30 rights x deg ~26: rights have the
    # bigger wedge sum, so lefts must center
    assert m["center_side"] == "src"


def test_multi_edges_collapse_and_empty(ray_session):
    assert _count(_ds([1, 1, 1, 2, 2, 2], [7, 8, 7, 7, 8, 8])) == 1
    assert _count(_ds([1, 2, 3], [7, 8, 9])) == 0  # matching: no wedges


def test_tiled_pair_generation_matches(ray_session, monkeypatch):
    """Hub centers past _PAIR_TILE take the tiled path — counts must
    be identical to the one-shot triu path."""
    from centrality_gpu_ray.pipelines import butterflies as bf

    rng = np.random.default_rng(3)
    # one deg-40 hub on the right side + random background
    src = np.concatenate([rng.integers(0, 30, 120), np.arange(40)])
    dst = np.concatenate([rng.integers(0, 12, 120), np.full(40, 99)])
    t = pa.table({"src": pa.array(src.astype(np.int64)),
                  "dst": pa.array(dst.astype(np.int64))})
    full = int(butterfly_count(ray.data.from_arrow(t))
               .column("butterflies")[0].as_py())
    monkeypatch.setattr(bf, "_PAIR_TILE", 7)  # force tiling everywhere
    tiled = int(butterfly_count(ray.data.from_arrow(t))
                .column("butterflies")[0].as_py())
    assert tiled == full
