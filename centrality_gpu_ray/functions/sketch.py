"""Distributed sketches — HyperLogLog distinct counting.

At 100 TB, "how many distinct tokens / URLs / content hashes" must not
cost a key shuffle. HyperLogLog gives a (1.04/√m)-relative-error
answer with a fixed 2^p-byte register array per *block*, merged by
elementwise max — commutative and associative, so the result is
independent of partitioning, batching and merge order:

* map side: each block hashes its values once (``pd.util.hash_array``,
  the same deterministic 64-bit hash the dedup family uses), takes the
  top ``p`` bits as the register index and the leading-zero rank of
  the low ``64-p`` bits as the register candidate, and reduces to ONE
  2^p uint8 array — a streaming pass, no driver rows;
* reduce side: the driver maxes P tiny arrays (4 KiB each at p=12)
  and applies the standard bias-corrected estimator with the
  linear-counting small-range correction (Flajolet et al. 2007).

The reference engine has no sketch surface; this is new-engine
training-data machinery (compare the exact path: ``hash_aggregate``
count over a full key exchange).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(values: np.ndarray, p: int = 12) -> np.ndarray:
    """One block's HLL register array (len 2^p, uint8) for already-
    hashed-or-raw values. Raw values are hashed with
    ``pd.util.hash_array`` (deterministic across processes)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if values.size == 0:
        return regs
    if values.dtype == np.uint64:
        h = values
    else:
        h = pd.util.hash_array(np.asarray(values))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    low = h << np.uint64(p)  # low 64-p bits, left-aligned in 64
    # rank = leading zeros of the low bits + 1, capped at 64-p+1.
    # Leading zeros via the float64 exponent trick would lose precision
    # past 2^53; use a vectorized bit-length instead: for x != 0,
    # lz = 63 - floor(log2(x)) computed exactly with successive shifts.
    rank = np.full(h.size, 64 - p + 1, dtype=np.uint8)
    nz = low != 0
    x = low[nz]
    lz = np.zeros(x.size, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        x = np.where(mask, x << np.uint64(shift), x)
    rank_nz = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    rank[nz] = rank_nz
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected cardinality estimate from a register array."""
    m = regs.size
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) over a Dataset — one streaming
    pass, driver receives only per-block 2^p-byte registers."""
    def fn(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        regs = hll_registers(vals, p)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          type=pa.binary())})

    fn.__name__ = f"hll_{col}"
    parts = ds.select_columns([col]).map_batches(
        fn, batch_format="pyarrow")
    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for buf in b.column("regs"):
            np.maximum(merged,
                       np.frombuffer(buf.as_py(), dtype=np.uint8),
                       out=merged)
    return hll_estimate(merged)


def hll_distinct_tokens(ds, p: int = 14,
                        text_col: str = "text") -> float:
    """Approximate distinct whitespace-token count over a corpus —
    the vocabulary-size probe that, exact, needs the vocab_topk
    shuffle; here it is shuffle-free."""
    def fn(batch: pd.DataFrame) -> pa.Table:
        text = batch[text_col].fillna("").str.strip()
        toks = text[text.str.len() > 0].str.split()
        flat = np.asarray([t for lst in toks for t in lst], dtype=object)
        regs = hll_registers(flat, p)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          type=pa.binary())})

    fn.__name__ = "hll_tokens"
    parts = ds.select_columns([text_col]).map_batches(
        fn, batch_format="pandas", batch_size=2048)
    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for buf in b.column("regs"):
            np.maximum(merged,
                       np.frombuffer(buf.as_py(), dtype=np.uint8),
                       out=merged)
    return hll_estimate(merged)
