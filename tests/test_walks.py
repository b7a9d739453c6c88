"""Random-walk generation: naive per-walk Python oracle, mode parity,
partitioning invariance, weighted exactness, skip-gram pairs."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.graph import Graph
from centrality_gpu_ray.pipelines.walks import (_choice_r, random_walks,
                                                skipgram_pairs)


def _random_edges(seed: int, n: int = 30, m: int = 90,
                  weights: bool = False) -> pa.Table:
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, size=m)
    d = rng.integers(0, n, size=m)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    uniq = np.unique(lo * n + hi)
    t = {"src": pa.array((uniq // n) * 5 + 3),   # non-dense original ids
         "dst": pa.array((uniq % n) * 5 + 3)}
    if weights:
        t["weight"] = pa.array(
            rng.integers(1, 7, size=uniq.size).astype(np.int64))
    return pa.table(t)


def _naive_walks(edges: pa.Table, walk_length: int, wpn: int, seed: int,
                 weighted: bool) -> dict[int, list[int]]:
    """Per-walk Python loop over a dict adjacency — the independent
    check that the vectorized CSR stepping (local) and the
    co-partitioned exchange (distributed) both implement the spec:
    neighbor lists sorted by (src, dst); pick = r mod deg (uniform) or
    the cumulative-weight segment containing r mod Σw."""
    src = edges.column("src").to_numpy()
    dst = edges.column("dst").to_numpy()
    w = (edges.column("weight").to_numpy() if weighted
         else np.ones(src.size, dtype=np.int64))
    ids = np.unique(np.concatenate([src, dst]))
    dense = {int(v): i for i, v in enumerate(ids)}
    adj: dict[int, list[tuple[int, int]]] = {i: [] for i in range(ids.size)}
    for a, b, ww in zip(src, dst, w):
        adj[dense[int(a)]].append((dense[int(b)], int(ww)))
        adj[dense[int(b)]].append((dense[int(a)], int(ww)))
    for v in adj:
        adj[v].sort()
    walks = {}
    for v in range(ids.size):
        for k in range(wpn):
            wid = v * wpn + k
            cur, path = v, [int(ids[v])]
            for t in range(1, walk_length + 1):
                r = int(_choice_r(np.array([wid]), t, seed)[0])
                nbrs = adj[cur]
                if weighted:
                    tot = sum(ww for _, ww in nbrs)
                    pick = r % tot
                    acc = 0
                    for nb, ww in nbrs:
                        acc += ww
                        if pick < acc:
                            cur = nb
                            break
                else:
                    cur = nbrs[r % len(nbrs)][0]
                path.append(int(ids[cur]))
            walks[wid] = path
    return walks


def _as_dict(table_or_ds) -> dict[int, list[int]]:
    t = (table_or_ds if isinstance(table_or_ds, pa.Table)
         else pa.concat_tables(table_or_ds.iter_batches(
             batch_size=None, batch_format="pyarrow")))
    return {int(w): [int(x) for x in nodes]
            for w, nodes in zip(t.column("walk_id").to_pylist(),
                                t.column("nodes").to_pylist())}


@pytest.mark.parametrize("weighted", [False, True])
def test_local_matches_naive_oracle(weighted):
    edges = _random_edges(1, weights=weighted)
    g = Graph(ray.data.from_arrow(edges), mode="local")
    got = _as_dict(random_walks(g, walk_length=7, walks_per_node=2,
                                seed=11, weighted=weighted))
    want = _naive_walks(edges, 7, 2, 11, weighted)
    assert got == want


@pytest.mark.parametrize("weighted", [False, True])
def test_distributed_matches_local(weighted):
    edges = _random_edges(2, weights=weighted)
    cfg = EngineConfig(num_partitions=3)
    g_loc = Graph(ray.data.from_arrow(edges), mode="local", config=cfg)
    g_dist = Graph(ray.data.from_arrow(edges).repartition(3),
                   mode="distributed", config=cfg)
    want = _as_dict(random_walks(g_loc, walk_length=5, walks_per_node=2,
                                 seed=3, weighted=weighted))
    got = _as_dict(random_walks(g_dist, walk_length=5, walks_per_node=2,
                                seed=3, weighted=weighted))
    assert got == want


def test_sharded_matches_local():
    edges = _random_edges(3)
    cfg = EngineConfig(num_partitions=3, dense_vertex_limit=5)
    g_sh = Graph(ray.data.from_arrow(edges).repartition(2), config=cfg)
    assert g_sh.sharded
    g_loc = Graph(ray.data.from_arrow(edges), mode="local")
    want = _as_dict(random_walks(g_loc, walk_length=4, seed=7))
    got = _as_dict(random_walks(g_sh, walk_length=4, seed=7))
    assert got == want


def test_partitioning_invariance_and_validity():
    edges = _random_edges(4)
    cfg = EngineConfig(num_partitions=5)
    a = _as_dict(random_walks(
        Graph(ray.data.from_arrow(edges).repartition(1),
              mode="distributed", config=cfg), walk_length=6, seed=0))
    b = _as_dict(random_walks(
        Graph(ray.data.from_arrow(edges).repartition(7),
              mode="distributed", config=EngineConfig(num_partitions=2)),
        walk_length=6, seed=0))
    assert a == b
    # every consecutive pair is a real edge
    ek = set()
    for s, d in zip(edges.column("src").to_pylist(),
                    edges.column("dst").to_pylist()):
        ek.add((s, d))
        ek.add((d, s))
    for path in a.values():
        assert len(path) == 7
        for x, y in zip(path, path[1:]):
            assert (x, y) in ek


def test_starts_and_walks_per_node():
    edges = _random_edges(5)
    g = Graph(ray.data.from_arrow(edges), mode="local")
    ids = g.node_ids
    starts = ids[[0, 3, 4]]
    t = random_walks(g, walk_length=3, walks_per_node=4, starts=starts)
    assert t.num_rows == 12
    assert sorted(set(t.column("start").to_pylist())) == sorted(
        int(x) for x in starts)
    # same walks when generated for all vertices (subset stability)
    full = _as_dict(random_walks(g, walk_length=3, walks_per_node=4))
    sub = _as_dict(t)
    for wid, path in sub.items():
        assert full[wid] == path
    with pytest.raises(ValueError, match="unknown vertex"):
        random_walks(g, walk_length=2, starts=[999999])


def test_weighted_follows_weights():
    # star: center 0, leaves 1 (weight 1) and 2 (weight 99) — walks
    # from 0 should overwhelmingly step to 2
    t = pa.table({"src": pa.array([0, 0], type=pa.int64()),
                  "dst": pa.array([1, 2], type=pa.int64()),
                  "weight": pa.array([1, 99], type=pa.int64())})
    g = Graph(ray.data.from_arrow(t), mode="local")
    out = random_walks(g, walk_length=1, walks_per_node=200, seed=0,
                       weighted=True, starts=[0])
    nxt = [nodes[1] for nodes in out.column("nodes").to_pylist()]
    frac2 = sum(1 for x in nxt if x == 2) / len(nxt)
    assert frac2 > 0.9


def test_weight_validation():
    t = pa.table({"src": pa.array([0], type=pa.int64()),
                  "dst": pa.array([1], type=pa.int64()),
                  "weight": pa.array([0], type=pa.int64())})
    g = Graph(ray.data.from_arrow(t), mode="local")
    with pytest.raises(ValueError, match="positive weights"):
        random_walks(g, walk_length=1, weighted=True)
    with pytest.raises(ValueError, match="walk_length"):
        random_walks(g, walk_length=0)


def test_skipgram_pairs_reference():
    walks = pa.table({
        "walk_id": pa.array([0, 1], type=pa.int64()),
        "start": pa.array([10, 20], type=pa.int64()),
        "nodes": pa.array([[10, 11, 12, 13], [20, 21]],
                          type=pa.list_(pa.int64()))})
    got = skipgram_pairs(walks, window=2)
    pairs = sorted(zip(got.column("center").to_pylist(),
                       got.column("context").to_pylist()))
    want = []
    for seq in ([10, 11, 12, 13], [20, 21]):
        for i, c in enumerate(seq):
            for j in range(max(0, i - 2), min(len(seq), i + 3)):
                if j != i:
                    want.append((c, seq[j]))
    assert pairs == sorted(want)
    # sliced input (non-zero offset buffers) must behave identically
    sliced = walks.slice(1, 1)
    got2 = skipgram_pairs(sliced, window=2)
    assert sorted(zip(got2.column("center").to_pylist(),
                      got2.column("context").to_pylist())) == sorted(
        [(20, 21), (21, 20)])
    # Dataset input returns a Dataset with identical rows
    ds_out = skipgram_pairs(ray.data.from_arrow(walks), window=2)
    ds_pairs = sorted((int(r["center"]), int(r["context"]))
                      for r in ds_out.take_all())
    assert ds_pairs == sorted(want)


def test_empty_graph_walks():
    t = pa.table({"src": pa.array([], type=pa.int64()),
                  "dst": pa.array([], type=pa.int64())})
    g = Graph(ray.data.from_arrow(t), mode="local")
    out = random_walks(g, walk_length=3)
    assert out.num_rows == 0
    assert out.schema.names == ["walk_id", "start", "nodes"]


# ---------------------------------------------------------------------------
# node2vec second-order (p/q) walks
# ---------------------------------------------------------------------------

def _naive_node2vec(edges: pa.Table, walk_length: int, wpn: int,
                    seed: int, weighted: bool, p: float,
                    q: float) -> dict[int, list[int]]:
    """Per-walk Python reimplementation of the rejection protocol
    (same (walk_id, step, round) streams, scalar control flow) — the
    independent check on the vectorized/distributed implementations."""
    from centrality_gpu_ray.pipelines.walks import _accept_u, _choice_r2

    src = edges.column("src").to_numpy()
    dst = edges.column("dst").to_numpy()
    w = (edges.column("weight").to_numpy() if weighted
         else np.ones(src.size, dtype=np.int64))
    ids = np.unique(np.concatenate([src, dst]))
    dense = {int(v): i for i, v in enumerate(ids)}
    adj: dict[int, list[tuple[int, int]]] = {i: [] for i in range(ids.size)}
    eset = set()
    for a, b, ww in zip(src, dst, w):
        da, db = dense[int(a)], dense[int(b)]
        adj[da].append((db, int(ww)))
        adj[db].append((da, int(ww)))
        eset.add((da, db))
        eset.add((db, da))
    for v in adj:
        adj[v].sort()
    inv_p, inv_q = 1.0 / p, 1.0 / q
    M = max(inv_p, 1.0, inv_q)

    def pick(cur: int, r: int) -> int:
        nbrs = adj[cur]
        if weighted:
            tot = sum(ww for _, ww in nbrs)
            t = r % tot
            acc = 0
            for nb, ww in nbrs:
                acc += ww
                if t < acc:
                    return nb
        return nbrs[r % len(nbrs)][0]

    walks = {}
    for v in range(ids.size):
        for k in range(wpn):
            wid = v * wpn + k
            prev, cur, path = v, v, [int(ids[v])]
            for t in range(1, walk_length + 1):
                if t == 1:
                    from centrality_gpu_ray.pipelines.walks import _choice_r
                    nxt = pick(cur, int(_choice_r(np.array([wid]), t,
                                                  seed)[0]))
                else:
                    nxt = None
                    for rnd in range(64):
                        r1 = _choice_r2(np.array([wid]), t, rnd, seed)
                        cand = pick(cur, int(r1[0]))
                        if cand == prev:
                            bias = inv_p
                        elif (prev, cand) in eset:
                            bias = 1.0
                        else:
                            bias = inv_q
                        if float(_accept_u(r1)[0]) * M < bias:
                            nxt = cand
                            break
                    assert nxt is not None
                prev, cur = cur, nxt
                path.append(int(ids[cur]))
            walks[wid] = path
    return walks


@pytest.mark.parametrize("weighted", [False, True])
def test_node2vec_local_matches_naive(weighted):
    edges = _random_edges(21, weights=weighted)
    g = Graph(ray.data.from_arrow(edges), mode="local")
    got = _as_dict(random_walks(g, walk_length=6, walks_per_node=2,
                                seed=13, weighted=weighted, p=0.5, q=2.0))
    want = _naive_node2vec(edges, 6, 2, 13, weighted, 0.5, 2.0)
    assert got == want


@pytest.mark.parametrize("weighted", [False, True])
def test_node2vec_distributed_matches_local(weighted):
    edges = _random_edges(22, weights=weighted)
    cfg = EngineConfig(num_partitions=3)
    g_loc = Graph(ray.data.from_arrow(edges), mode="local", config=cfg)
    g_dist = Graph(ray.data.from_arrow(edges).repartition(4),
                   mode="distributed", config=cfg)
    kw = dict(walk_length=5, walks_per_node=2, seed=5,
              weighted=weighted, p=0.25, q=4.0)
    assert _as_dict(random_walks(g_dist, **kw)) \
        == _as_dict(random_walks(g_loc, **kw))


def test_node2vec_sharded_matches_local():
    edges = _random_edges(23)
    cfg = EngineConfig(num_partitions=3, dense_vertex_limit=5)
    g_sh = Graph(ray.data.from_arrow(edges).repartition(2), config=cfg)
    assert g_sh.sharded
    g_loc = Graph(ray.data.from_arrow(edges), mode="local")
    kw = dict(walk_length=4, seed=9, p=2.0, q=0.5)
    assert _as_dict(random_walks(g_sh, **kw)) \
        == _as_dict(random_walks(g_loc, **kw))


def test_node2vec_low_p_returns():
    """p ≪ 1 → strong return bias: on a path graph the walk oscillates
    (interior candidate set = {prev (bias 1/p), other (bias 1/q=1)})."""
    n = 12
    edges = pa.table({
        "src": pa.array(np.arange(n - 1, dtype=np.int64)),
        "dst": pa.array(np.arange(1, n, dtype=np.int64))})
    g = Graph(ray.data.from_arrow(edges), mode="local")
    out = _as_dict(random_walks(g, walk_length=30, walks_per_node=8,
                                seed=2, p=0.01, q=1.0))
    returns = total = 0
    for path in out.values():
        for i in range(2, len(path)):
            if 0 < path[i - 1] < n - 1:  # interior: return possible
                total += 1
                returns += path[i] == path[i - 2]
    assert total > 500
    assert returns / total > 0.9


def test_node2vec_empirical_matches_analytic():
    """Aggregate (u, v, x) transition frequencies over many walks match
    the analytic node2vec conditional w(v,x)·bias(u,x)/Z within 5σ."""
    edges = _random_edges(24, n=12, m=40)
    g = Graph(ray.data.from_arrow(edges), mode="local")
    p_, q_ = 0.5, 2.0
    out = _as_dict(random_walks(g, walk_length=40, walks_per_node=60,
                                seed=31, p=p_, q=q_))
    nbrs: dict[int, list[int]] = {}
    eset = set()
    for a, b in zip(edges.column("src").to_pylist(),
                    edges.column("dst").to_pylist()):
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
        eset.add((a, b))
        eset.add((b, a))
    counts: dict[tuple[int, int], dict[int, int]] = {}
    for path in out.values():
        for i in range(2, len(path)):
            u, v, x = path[i - 2], path[i - 1], path[i]
            counts.setdefault((u, v), {}).setdefault(x, 0)
            counts[(u, v)][x] += 1
    checked = 0
    for (u, v), cx in counts.items():
        tot = sum(cx.values())
        if tot < 400:
            continue
        bias = {x: (1 / p_ if x == u else (1.0 if (u, x) in eset
                                           else 1 / q_))
                for x in nbrs[v]}
        z = sum(bias.values())
        for x in nbrs[v]:
            want = bias[x] / z
            se = (want * (1 - want) / tot) ** 0.5
            assert abs(cx.get(x, 0) / tot - want) <= 5 * se + 1e-9, \
                (u, v, x)
            checked += 1
    assert checked >= 10


def test_node2vec_validation():
    edges = _random_edges(25)
    g = Graph(ray.data.from_arrow(edges), mode="local")
    with pytest.raises(ValueError):
        random_walks(g, walk_length=3, p=0.0)
    with pytest.raises(ValueError):
        random_walks(g, walk_length=3, q=-1.0)


def test_duplicate_starts_rejected():
    edges = _random_edges(26)
    g = Graph(ray.data.from_arrow(edges), mode="local")
    some = edges.column("src").to_pylist()[0]
    with pytest.raises(ValueError, match="duplicate"):
        random_walks(g, walk_length=3, starts=[some, some])
