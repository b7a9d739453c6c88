"""Deterministic node-id minting.

The reference densely relabels vertices per BCC with a first-seen-order
``new_id_map[u] = cnt++`` std::map (M4, ``modified_apsp.cpp:273-363``)
— inherently sequential. The new engine uses two deterministic,
order-independent schemes:

* :func:`hash_ids` — 63-bit hash of the entity key (pandas'
  deterministic siphash, cython-vectorized). No shuffle, no global
  coordination, stable across runs/partitionings — the scale path.
  Collision probability for K keys ≈ K²/2⁶⁴ (≈5e-3 at K=1e10),
  detectable via the nodes table (distinct keys vs distinct ids).
* :func:`mint_dense_ids` — sorted-distinct keys → row-number, giving
  dense ``0..n-1`` ids (what the dense-vector algorithm paths need).
  Sort-based, deterministic, independent of partition count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MASK63 = (1 << 63) - 1


def hash_ids_array(keys) -> np.ndarray:
    """Vectorized deterministic 63-bit key hash → int64 ids."""
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        keys = keys.to_numpy(zero_copy_only=False)
    hashed = pd.util.hash_array(np.asarray(keys, dtype=object), categorize=False)
    return (hashed & _MASK63).astype(np.int64)


def hash_ids(ds, key_col: str, id_col: str = "id"):
    """Append a deterministic hash id column for `key_col`."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = hash_ids_array(batch.column(key_col))
        return batch.append_column(id_col, pa.array(ids, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def mint_dense_ids(ds, key_col: str):
    """Distinct keys → dense ids by sorted order.

    Returns a small Dataset ``(key, id)`` with id = rank of key in the
    global sorted order. The distinct+sort is a shuffle over *distinct*
    keys only; the id assignment walks sorted blocks in order (driver
    reads only block row-counts, not rows — the cumulative offsets are
    exact and deterministic).
    """
    import ray
    import ray.data

    distinct = ds.groupby(key_col).count().select_columns([key_col]).sort(key_col)
    mat = distinct.materialize()
    blocks = []  # (block_ref, row_offset) in global sorted order
    total = 0
    for bundle in mat.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            blocks.append((block_ref, total))
            total += meta.num_rows

    @ray.remote
    def _assign(block, offset):
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        ids = np.arange(offset, offset + tbl.num_rows, dtype=np.int64)
        return tbl.append_column("id", pa.array(ids, type=pa.int64()))

    out_refs = [_assign.remote(block_ref, off) for block_ref, off in blocks]
    return ray.data.from_arrow_refs(out_refs)
