"""Superstep message exchange: pre-aggregated, optionally salted groupby.

This is the engine's replacement for the reference's
``atomicAdd(&bc[k], ...)`` score accumulation (``kernels_free.cu:423-426``)
and its OpenMP per-thread frontier merge (``bcc_bfs.cpp:529-597``): each
superstep's messages are combined per batch first (at most one row per
distinct key per block leaves the map side), then a groupby-aggregate
shuffle merges the partials. Sum/min are associative-commutative, so a
two-level **salted** aggregate — ``groupby((key, salt))`` then
``groupby(key)`` — is result-identical while spreading a hot key's rows
across reducers (the north_rule's explicit skew handling; the
reference's answer to skew was whole-graph decomposition instead,
SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _salt_batch(batch: pa.Table, buckets: int) -> pa.Table:
    # Deterministic per-(key, block) salt: mixes the key with a block
    # fingerprint so the same hot key lands on different salts in
    # different blocks (that is what spreads the reduce load).
    v = batch.column("v").to_numpy()
    fp = np.int64(len(v)) ^ (np.int64(v[0]) if len(v) else np.int64(0)) \
        ^ (np.int64(v[-1]) << 1 if len(v) else np.int64(0))
    mix = np.uint64(0x9E3779B97F4A7C15)
    salt = (((v ^ fp).astype(np.uint64) * mix) >> np.uint64(33)) % np.uint64(buckets)
    return batch.append_column("salt", pa.array(salt.astype(np.int64)))


def aggregate_messages(msgs_ds, agg: str = "sum", salt_buckets: int = 0):
    """Combine a ``(v:int64, c)`` message Dataset into one row per key.

    agg: "sum" or "min". With ``salt_buckets > 1`` runs the two-level
    salted aggregate; the first level bounds any single reducer's rows
    for a hot key to ~(#blocks / buckets), the second level touches at
    most ``buckets`` rows per key.
    """
    from ray.data.aggregate import Min, Sum

    Agg = {"sum": Sum, "min": Min}[agg]
    if salt_buckets and salt_buckets > 1:
        salted = msgs_ds.map_batches(lambda t: _salt_batch(t, salt_buckets),
                                     batch_format="pyarrow")
        level1 = salted.groupby(["v", "salt"]).aggregate(Agg("c", alias_name="c"))
        return level1.groupby("v").aggregate(Agg("c", alias_name="c"))
    return msgs_ds.groupby("v").aggregate(Agg("c", alias_name="c"))


def dense_from_pairs(pairs_ds, num_vertices: int, init: float | int = 0.0,
                     dtype=np.float64) -> np.ndarray:
    """(v, c) Dataset (unique v) → dense vector. Order-independent:
    each key is written exactly once."""
    out = np.full(num_vertices, init, dtype=dtype)
    for batch in pairs_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        out[batch.column("v").to_numpy()] = batch.column("c").to_numpy()
    return out


def driver_combine_sum(msgs_ds, num_vertices: int) -> np.ndarray:
    """Dense-state fast path: combine per-block partial (v, c) messages
    on the driver instead of a groupby shuffle.

    Each map-side block emitted at most one row per distinct key, so the
    total partial-row volume is ≤ #blocks × #keys-touched — for a
    dense-vector-sized state this is driver-feasible by construction,
    and it removes the per-superstep all-to-all entirely (the shuffle
    path in :func:`aggregate_messages` remains the sharded-state route).

    Float sums are made **order-deterministic** despite arbitrary block
    arrival order: all partial rows are sorted by (v, c) before the
    segmented add, so resumed/re-partitioned runs give bit-identical
    vectors (SURVEY.md §7.5.5).
    """
    vs, cs = [], []
    for batch in msgs_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        vs.append(batch.column("v").to_numpy())
        cs.append(batch.column("c").to_numpy())
    out = np.zeros(num_vertices, dtype=np.float64)
    if not vs:
        return out
    v = np.concatenate(vs)
    c = np.concatenate(cs)
    order = np.lexsort((c, v))
    np.add.at(out, v[order], c[order])
    return out


def driver_combine_min(msgs_ds, num_vertices: int, init: int) -> np.ndarray:
    """Min counterpart (integer labels — inherently order-free)."""
    out = np.full(num_vertices, init, dtype=np.int64)
    for batch in msgs_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        np.minimum.at(out, batch.column("v").to_numpy(),
                      batch.column("c").to_numpy())
    return out
