"""HITS over the bipartite double cover: classic per-side-normalized
serial oracle, dense/sharded parity, role bookkeeping."""
import numpy as np
import pyarrow as pa
import ray.data

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.hits import hits_fixed


def _directed_edges(seed: int, n_src: int = 12, n_dst: int = 9,
                    m: int = 60) -> pa.Table:
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n_src, size=m).astype(np.int64)
    d = rng.integers(0, n_dst, size=m).astype(np.int64)
    # non-dense, OVERLAPPING id spaces: node 7 can be both a source
    # (hub role) and a target (authority role)
    return pa.table({"src": pa.array(s * 3 + 1), "dst": pa.array(d * 4 + 1)})


def _classic_hits(edges: pa.Table, supersteps: int):
    """Textbook HITS with simultaneous updates and PER-SIDE L1
    normalization every round — the construction the engine's
    joint-normalized double-cover iteration must reproduce (see the
    equivalence argument in pipelines/hits.py)."""
    s = edges.column("src").to_numpy()
    d = edges.column("dst").to_numpy()
    pairs = np.unique(s.astype(np.int64) * (1 << 32) + d.astype(np.int64))
    s, d = pairs >> 32, pairs & ((1 << 32) - 1)
    srcs = np.unique(s)
    dsts = np.unique(d)
    si = np.searchsorted(srcs, s)
    di = np.searchsorted(dsts, d)
    # uniform joint init over the double cover = uniform per side up to
    # one constant, which per-side normalization erases after round 1
    h = np.full(srcs.size, 1.0, dtype=np.float64)
    a = np.full(dsts.size, 1.0, dtype=np.float64)
    h /= h.sum()
    a /= a.sum()
    for _ in range(supersteps):
        h2 = np.zeros(srcs.size)
        np.add.at(h2, si, a[di])
        a2 = np.zeros(dsts.size)
        np.add.at(a2, di, h[si])
        h = h2 / h2.sum()
        a = a2 / a2.sum()
    return dict(zip(srcs.tolist(), h.tolist())), \
        dict(zip(dsts.tolist(), a.tolist()))


def _as_dicts(out):
    if not isinstance(out, pa.Table):
        out = pa.concat_tables(
            b for b in out.iter_batches(batch_size=None,
                                        batch_format="pyarrow"))
    node = out.column("node").to_numpy()
    side = out.column("side").to_pylist()
    nano = out.column("hits_nano").to_numpy()
    hub = {int(n): int(v) for n, sd, v in zip(node, side, nano)
           if sd == "hub"}
    auth = {int(n): int(v) for n, sd, v in zip(node, side, nano)
            if sd == "auth"}
    return hub, auth


def test_matches_classic_hits(ray_session):
    edges = _directed_edges(7)
    out = hits_fixed(ray.data.from_arrow(edges), supersteps=12)
    hub, auth = _as_dicts(out)
    ref_h, ref_a = _classic_hits(edges, supersteps=12)
    assert set(hub) == set(ref_h) and set(auth) == set(ref_a)
    for n, v in ref_h.items():
        assert abs(hub[n] - v * 1e9) <= 1.0, n
    for n, v in ref_a.items():
        assert abs(auth[n] - v * 1e9) <= 1.0, n
    # per-side nano sums ≈ 1e9 (L1-normalized per side)
    assert abs(sum(hub.values()) - 1_000_000_000) <= len(hub)
    assert abs(sum(auth.values()) - 1_000_000_000) <= len(auth)


def test_roles_are_independent(ray_session):
    # 1→2→3 chain: 1 and 2 are hubs, 2 and 3 are authorities; node 2
    # carries BOTH roles with independent scores
    edges = pa.table({"src": pa.array([1, 2], type=pa.int64()),
                      "dst": pa.array([2, 3], type=pa.int64())})
    hub, auth = _as_dicts(hits_fixed(ray.data.from_arrow(edges),
                                     supersteps=8))
    assert set(hub) == {1, 2} and set(auth) == {2, 3}
    # symmetric chain: both hubs equal, both authorities equal
    assert hub[1] == hub[2]
    assert auth[2] == auth[3]


def test_multi_edges_collapse(ray_session):
    once = pa.table({"src": pa.array([1, 1, 5], type=pa.int64()),
                     "dst": pa.array([2, 4, 2], type=pa.int64())})
    thrice = pa.table({
        "src": pa.array([1, 1, 5] * 3, type=pa.int64()),
        "dst": pa.array([2, 4, 2] * 3, type=pa.int64())})
    a = _as_dicts(hits_fixed(ray.data.from_arrow(once), supersteps=6))
    b = _as_dicts(hits_fixed(ray.data.from_arrow(thrice), supersteps=6))
    assert a == b


def test_sharded_parity(ray_session):
    edges = _directed_edges(11, n_src=20, n_dst=15, m=120)
    ds = ray.data.from_arrow(edges).repartition(4)
    dense = hits_fixed(ds, supersteps=10)
    sharded = hits_fixed(ds, supersteps=10,
                         config=EngineConfig(dense_vertex_limit=2,
                                             num_partitions=4))
    hd, ad = _as_dicts(dense)
    hs, as_ = _as_dicts(sharded)
    assert hd.keys() == hs.keys() and ad.keys() == as_.keys()
    for n in hd:
        assert abs(hd[n] - hs[n]) <= 1, n
    for n in ad:
        assert abs(ad[n] - as_[n]) <= 1, n


def test_dense_row_order_matches_sharded(ray_session):
    """Both modes emit (side, node)-sorted rows — 'auth' block first
    (string sort order), ascending node within a side."""
    edges = _directed_edges(31)
    ds = ray.data.from_arrow(edges)
    dense = hits_fixed(ds, supersteps=6)
    rows_dense = list(zip(dense.column("side").to_pylist(),
                          dense.column("node").to_pylist()))
    sharded = hits_fixed(ds, supersteps=6,
                         config=EngineConfig(dense_vertex_limit=2,
                                             num_partitions=4))
    tbl = pa.concat_tables(sharded.iter_batches(batch_size=None,
                                                batch_format="pyarrow"))
    rows_sh = list(zip(tbl.column("side").to_pylist(),
                       tbl.column("node").to_pylist()))
    assert rows_dense == sorted(rows_dense)
    assert rows_dense == rows_sh
