"""Sharded vertex dictionary — the >``dense_vertex_limit`` relabel path.

The dense path builds the sorted distinct-id vector on the driver
(fine to ~5M vertices). At the north_rule's 10^12-file scale the vertex
set does not fit a driver vector, so the dictionary itself is built
distributed and lives as range-partitioned plasma blocks:

1. per-block partial unique (one map pass, no shuffle),
2. exact distinct via the explicit hash shuffle
   (``stages/shuffle.py::hash_distinct``),
3. global ``sort("v")`` → sorted, range-partitioned id blocks,
4. per-block (min, count) — P scalars — to the driver; dense id of an
   original id = block offset + rank within its block.

The driver holds only the P block boundaries/offsets. Mappers resolve
ids by reading the dict blocks ZERO-COPY from the object store (one
physical copy per node — the same budget as the broadcast state
vector; at 1e9 vertices the dict is 8 GB/node, which is the documented
envelope). Replaces the driver concat + ``NotImplementedError`` at
``graph.py``; the reference's first-seen relabel is
``modified_apsp.cpp:273-363``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class VertexDict:
    """Range-partitioned sorted vertex dictionary.

    Attributes:
        block_refs: P plasma refs, each an int64 np.ndarray of sorted
            original ids (concatenation over blocks = full sorted set).
        mins: first id of each block (len P).
        offsets: dense-id offset of each block (len P+1; offsets[-1]=n).
    """

    def __init__(self, block_refs: list, mins: np.ndarray, offsets: np.ndarray):
        self.block_refs = block_refs
        self.mins = mins
        self.offsets = offsets
        self.num_vertices = int(offsets[-1])

    @staticmethod
    def build(uniq_ds, num_partitions: int = 16) -> "VertexDict":
        """``uniq_ds``: Dataset with an int64 ``v`` column of candidate
        ids (per-block pre-uniqued; cross-block duplicates fine)."""
        import ray

        from centrality_gpu_ray.stages.shuffle import hash_distinct

        dist = hash_distinct(uniq_ds, ["v"], num_partitions=num_partitions)
        sorted_ds = dist.sort("v").materialize()

        @ray.remote
        def to_array(block: pa.Table):
            v = np.ascontiguousarray(block.column("v").to_numpy())
            return v, (int(v[0]) if v.size else None, int(v.size))

        pairs = []
        for bundle in sorted_ds.iter_internal_ref_bundles():
            for block_ref, meta in bundle.blocks:
                if meta.num_rows is None or meta.num_rows > 0:
                    pairs.append(to_array.options(num_returns=2).remote(block_ref))
        metas = [ray.get(m) for _, m in pairs]
        arr_refs = [a for a, _ in pairs]
        keep = [(r, m) for r, m in zip(arr_refs, metas) if m[1] > 0]
        mins = np.array([m[0] for _, m in keep], dtype=np.int64)
        counts = np.array([m[1] for _, m in keep], dtype=np.int64)
        offsets = np.zeros(len(keep) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        # The whole dictionary depends on iter_internal_ref_bundles()
        # yielding the sort("v") blocks in GLOBAL sorted order. If that
        # internal-API invariant ever breaks, every searchsorted remap
        # would silently corrupt ids — make it a loud O(P) failure
        # instead (ADVICE r2).
        if not np.all(np.diff(mins) > 0):
            raise AssertionError(
                "VertexDict.build: sorted dict blocks arrived out of "
                "global order (Ray internal block-order invariant "
                f"violated); block mins = {mins.tolist()[:20]}...")
        return VertexDict([r for r, _ in keep], mins, offsets)


class _DictReader:
    """Per-worker cached zero-copy views of the dict blocks."""

    def __init__(self, dict_meta):
        self._mins, self._offsets, self._block_refs = dict_meta
        self._blocks = None

    def _ensure(self):
        if self._blocks is None:
            import ray

            self._blocks = ray.get(list(self._block_refs))
        return self._blocks

    def to_dense(self, x: np.ndarray) -> np.ndarray:
        """Original ids → dense 0..n-1 (every id must be present)."""
        blocks = self._ensure()
        blk = np.searchsorted(self._mins, x, side="right") - 1
        out = np.empty(x.size, dtype=np.int64)
        for b in np.unique(blk):
            m = blk == b
            out[m] = self._offsets[b] + np.searchsorted(blocks[b], x[m])
        return out

    def to_original(self, dense: np.ndarray) -> np.ndarray:
        """Dense ids → original ids."""
        blocks = self._ensure()
        blk = np.searchsorted(self._offsets, dense, side="right") - 1
        out = np.empty(dense.size, dtype=np.int64)
        for b in np.unique(blk):
            m = blk == b
            out[m] = blocks[b][dense[m] - self._offsets[b]]
        return out


class _RemapSharded:
    """map_batches callable: (src, dst, weight) → dense (s, d, w)."""

    def __init__(self, dict_meta):
        self._reader = _DictReader(dict_meta)

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = self._reader.to_dense(batch.column("src").to_numpy())
        d = self._reader.to_dense(batch.column("dst").to_numpy())
        w = (batch.column("weight").to_numpy()
             if "weight" in batch.column_names
             else np.ones(len(batch), dtype=np.int64))
        return pa.table({"s": pa.array(s), "d": pa.array(d),
                         "w": pa.array(w.astype(np.int64))})


def scores_dataset(vdict: VertexDict, pool, col: str,
                   to_original_values: bool = False,
                   aux_col: str | None = None,
                   aux_to_original: bool = False,
                   value_cast: str | None = None,
                   aux_cast: str | None = None):
    """Per-owner state chunks → Dataset of (node, col[, aux_col]) rows
    without the driver ever holding n rows. ``to_original_values=True``
    maps the primary VALUES (dense vertex ids, e.g. CC labels) back to
    original ids; ``aux_col`` additionally emits the owners' aux vector
    (e.g. BFS parents), with ``aux_to_original`` mapping non-negative
    aux values to original ids (negatives pass through).
    ``value_cast``/``aux_cast``: numpy dtype names applied to the
    emitted vectors (owner state is float64; integral/bool results —
    colors, MIS membership — cast back so cross-mode schemas match)."""
    import ray
    import ray.data

    dict_meta = (vdict.mins, vdict.offsets, vdict.block_refs)

    @ray.remote
    def emit(lo: int, hi: int, state: np.ndarray, aux, meta):
        reader = _DictReader(meta)
        dense = np.arange(lo, hi, dtype=np.int64)
        vals = state
        if to_original_values:
            vals = reader.to_original(state.astype(np.int64))
        if value_cast is not None:
            vals = vals.astype(value_cast)
        cols = {"node": pa.array(reader.to_original(dense)),
                col: pa.array(vals)}
        if aux is not None:
            av = aux
            if aux_to_original:
                ai = aux.astype(np.int64)
                mapped = reader.to_original(np.maximum(ai, 0))
                av = np.where(ai >= 0, mapped, -1).astype(np.int64)
            elif aux_cast is not None:
                av = av.astype(aux_cast)
            cols[aux_col] = pa.array(av)
        return pa.table(cols)

    state_refs = [a.owner_get_state.remote() for a in pool.actors]
    aux_refs = ([a.owner_get_aux.remote() for a in pool.actors]
                if aux_col is not None else [None] * len(pool.actors))
    bounds = pool.bounds
    tabs = [emit.remote(int(bounds[i]), int(bounds[i + 1]), state_refs[i],
                        aux_refs[i], dict_meta)
            for i in range(len(pool.actors))]
    return ray.data.from_arrow_refs(tabs)
