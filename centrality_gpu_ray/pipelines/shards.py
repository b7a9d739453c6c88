"""Edge-shard actor pool — the resident-graph superstep engine (T1/T2).

The reference copies R/C/F to the GPU once and every kernel launch
reuses them (``kernels_free.cu:44-74``). Equivalent here: the
materialized edge blocks are dealt round-robin to a pool of long-lived
Ray actors; each actor ingests its slice ONCE into presorted numpy
arrays with precomputed segment boundaries, so every superstep is a
single vectorized gather + ``np.add.reduceat`` / ``minimum.reduceat``
over its shard — no per-superstep Ray Data executor startup (measured
~1.5 s fixed per execution at sf0.1, 20× the actual compute), no
re-deriving per-block indices.

Message combine stays on the driver in deterministic shard order
(shards are a fixed list; per-shard partials are already key-sorted),
so float accumulation is bit-reproducible across runs and resumes.

On a multi-node cluster the pool spreads across nodes (one actor per
core), each holding ~|E|/K edges; the broadcast state vector is one
object-store copy per node. This is precisely SURVEY.md §7.3's
"stateful actor pools: CSR shard holders".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _shard_class():
    import ray

    @ray.remote(num_cpus=1)
    class EdgeShard:
        """Holds one edge slice, presorted by message destination."""

        def __init__(self, *tables: pa.Table):
            s = np.concatenate([t.column("s").to_numpy() for t in tables]) \
                if tables else np.empty(0, np.int64)
            d = np.concatenate([t.column("d").to_numpy() for t in tables]) \
                if tables else np.empty(0, np.int64)
            w = np.concatenate([t.column("w").to_numpy() for t in tables]) \
                if tables else np.empty(0, np.int64)
            # both message directions, fixed (v=dst of message, u=src)
            v = np.concatenate([d, s])
            u = np.concatenate([s, d])
            ww = np.concatenate([w, w]).astype(np.float64)
            order = np.lexsort((u, v))
            self.v = np.ascontiguousarray(v[order])
            self.u = np.ascontiguousarray(u[order])
            self.w = np.ascontiguousarray(ww[order])
            self.uniq_v, self.seg = np.unique(self.v, return_index=True)
            self.num_edges = int(s.size)

        def ready(self) -> int:
            return self.num_edges

        def pr_contrib(self, wvec: np.ndarray):
            """Partial PageRank gather: sums of wvec[u] per dst (sorted
            segments → reduceat, deterministic)."""
            c = wvec[self.u]
            sums = np.add.reduceat(c, self.seg) if c.size else c
            return self.uniq_v, sums

        def pr_contrib_weighted(self, wvec: np.ndarray):
            c = wvec[self.u] * self.w
            sums = np.add.reduceat(c, self.seg) if c.size else c
            return self.uniq_v, sums

        def min_label(self, labels: np.ndarray):
            """Partial min-label per dst (CC superstep)."""
            c = labels[self.u]
            mins = np.minimum.reduceat(c, self.seg) if c.size else c
            return self.uniq_v, mins

        def label_counts(self, labels: np.ndarray, weighted: bool):
            """Partial (v, label, count) for mode-LP."""
            lab = labels[self.u]
            pairs = self.v * np.int64(labels.size) + lab
            uniq, inv = np.unique(pairs, return_inverse=True)
            wts = self.w if weighted else np.ones(lab.size)
            cnt = np.bincount(inv, weights=wts).astype(np.int64)
            return (uniq // labels.size, uniq % labels.size, cnt)

        def bfs_step(self, in_frontier: np.ndarray, visited: np.ndarray):
            """Partial (v, min parent) for unvisited neighbors of the
            frontier."""
            mask = in_frontier[self.u] & ~visited[self.v]
            if not mask.any():
                z = np.empty(0, dtype=np.int64)
                return z, z
            v, u = self.v[mask], self.u[mask]
            order = np.lexsort((u, v))
            v, u = v[order], u[order]
            first = np.ones(v.size, dtype=bool)
            first[1:] = v[1:] != v[:-1]
            return v[first], u[first]

    return EdgeShard


class ShardPool:
    """Fixed list of EdgeShard actors built from a materialized edge
    Dataset; deterministic shard order."""

    def __init__(self, edges_ds, num_shards: int):
        import ray

        EdgeShard = _shard_class()
        block_refs = []
        for bundle in edges_ds.iter_internal_ref_bundles():
            for block_ref, meta in bundle.blocks:
                if meta.num_rows is None or meta.num_rows > 0:
                    block_refs.append(block_ref)
        k = max(1, min(num_shards, len(block_refs)))
        assignments: list[list] = [[] for _ in range(k)]
        for i, br in enumerate(block_refs):
            assignments[i % k].append(br)
        # varargs so each block ref is a top-level arg (auto-deref,
        # zero-copy plasma read inside the actor)
        self.actors = [EdgeShard.remote(*a) for a in assignments]
        ray.get([a.ready.remote() for a in self.actors])

    def gather_sum(self, wvec_ref, num_vertices: int, weighted: bool = False) -> np.ndarray:
        """Deterministic combined PageRank gather across shards."""
        import ray

        method = "pr_contrib_weighted" if weighted else "pr_contrib"
        parts = ray.get([getattr(a, method).remote(wvec_ref) for a in self.actors])
        out = np.zeros(num_vertices, dtype=np.float64)
        for uniq_v, sums in parts:  # fixed shard order → deterministic
            np.add.at(out, uniq_v, sums)
        return out

    def gather_min(self, labels_ref, num_vertices: int, init: np.ndarray) -> np.ndarray:
        import ray

        parts = ray.get([a.min_label.remote(labels_ref) for a in self.actors])
        out = init.copy()
        for uniq_v, mins in parts:
            np.minimum.at(out, uniq_v, mins)
        return out

    def gather_label_counts(self, labels_ref, weighted: bool = True):
        import ray

        parts = ray.get([a.label_counts.remote(labels_ref, weighted)
                         for a in self.actors])
        v = np.concatenate([p[0] for p in parts])
        lab = np.concatenate([p[1] for p in parts])
        cnt = np.concatenate([p[2] for p in parts])
        return v, lab, cnt

    def gather_bfs(self, frontier_ref, visited_ref):
        import ray

        parts = ray.get([a.bfs_step.remote(frontier_ref, visited_ref)
                         for a in self.actors])
        v = np.concatenate([p[0] for p in parts])
        u = np.concatenate([p[1] for p in parts])
        return v, u
