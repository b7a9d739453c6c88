"""Shared vectorized numpy helpers (one copy — four modules used to
carry byte-identical private reimplementations of ragged_arange)."""

from __future__ import annotations

import numpy as np


def ragged_arange(counts: np.ndarray) -> np.ndarray:
    """``[0..c0), [0..c1), ...`` concatenated, fully vectorized.

    The workhorse of every CSR slice gather: given per-row counts it
    yields the within-row offsets, so ``np.repeat(starts, counts) +
    ragged_arange(counts)`` addresses each row's slots. Zero counts
    are allowed (they contribute nothing)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    nz = counts[counts > 0]
    out = np.ones(total, dtype=np.int64)
    ends = np.cumsum(nz)
    out[0] = 0
    out[ends[:-1]] = 1 - nz[:-1]
    return np.cumsum(out)


def arrow_type(t):
    """Coerce a Ray ``Dataset.schema().types`` entry to an Arrow
    DataType: Arrow datasets already yield DataTypes, pandas-backed
    blocks yield numpy dtypes / Python classes (object dtype — pandas'
    string carrier — maps to ``string``)."""
    import numpy as np
    import pyarrow as pa

    if isinstance(t, pa.DataType):
        return t
    try:
        if np.dtype(t) == np.dtype(object):
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()
