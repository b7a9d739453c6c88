"""Distributed exact PCA over an embedding column — whitening /
dimensionality reduction for the ANN / SemDeDup / clustering stack
(classical principal component analysis; public method).

Fit is ONE streaming pass: every block emits a fixed-size partial
``(count, Σx, ΣxxT)`` (d + d² floats — independent of row count), the
driver folds the partials and solves the d×d symmetric eigenproblem
(d is the embedding width, ≤ a few thousand — driver-sized by
definition). Transform is a stateless vectorized map. Deterministic:
the fold is a sum of block partials (order-free up to float
association), `numpy.linalg.eigh` is deterministic, and a sign
convention (largest-|loading| coordinate made positive) pins each
component's direction.

The scale shape mirrors the quality-classifier/LM trainers: per-block
fixed-size partials, no shuffle, nothing driver-side proportional to
rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pca_fit", "pca_transform"]


def _vec_matrix(col, n: int) -> np.ndarray:
    """Embedding column (fixed/variable list or Ray tensor extension)
    → (n, d) float64 matrix, flat-buffer view."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    if isinstance(arr, pa.ExtensionArray):
        arr = arr.storage
    if pa.types.is_fixed_size_list(arr.type):
        return np.asarray(arr.flatten(), dtype=np.float64) \
            .reshape(n, -1)
    offs = np.asarray(arr.offsets)
    widths = np.diff(offs)
    if widths.size and not (widths == widths[0]).all():
        raise ValueError("embedding column is not fixed-width")
    vals = np.asarray(arr.values)[offs[0]:offs[-1]]
    return np.asarray(vals, dtype=np.float64).reshape(
        n, int(widths[0]) if widths.size else 0)


def pca_fit(emb_ds, n_components: int | None = None,
            vec_col: str = "embedding") -> dict:
    """One-pass exact PCA fit; returns ``{"mean", "components",
    "explained_variance", "n_rows"}`` — components are rows (k, d),
    sorted by decreasing variance, sign-pinned."""

    def part(t: pa.Table) -> pa.Table:
        x = _vec_matrix(t.column(vec_col), t.num_rows)
        return pa.table({
            "n": pa.array([t.num_rows], type=pa.int64()),
            "s": pa.array([x.sum(axis=0).tobytes()], type=pa.binary()),
            "ss": pa.array([(x.T @ x).tobytes()], type=pa.binary()),
            "d": pa.array([x.shape[1]], type=pa.int64()),
        })

    n_total, d = 0, None
    s_sum = ss_sum = None
    for b in emb_ds.select_columns([vec_col]).map_batches(
            part, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for i in range(b.num_rows):
            di = int(b.column("d")[i].as_py())
            if d is None:
                d = di
                s_sum = np.zeros(d)
                ss_sum = np.zeros((d, d))
            elif di != d:
                raise ValueError(
                    f"pca_fit: embedding width changed {d} → {di}")
            n_total += int(b.column("n")[i].as_py())
            s_sum += np.frombuffer(b.column("s")[i].as_py(),
                                   dtype=np.float64)
            ss_sum += np.frombuffer(b.column("ss")[i].as_py(),
                                    dtype=np.float64).reshape(d, d)
    if n_total < 2:
        raise ValueError("pca_fit: need at least 2 rows")
    mean = s_sum / n_total
    cov = (ss_sum - n_total * np.outer(mean, mean)) / (n_total - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T  # (d, d) rows = components
    # sign convention: the largest-|loading| coordinate is positive
    piv = np.argmax(np.abs(comps), axis=1)
    signs = np.sign(comps[np.arange(comps.shape[0]), piv])
    signs[signs == 0] = 1.0
    comps = comps * signs[:, None]
    k = d if n_components is None else min(int(n_components), d)
    return {"mean": mean, "components": comps[:k],
            "explained_variance": evals[:k], "n_rows": n_total}


def pca_transform(emb_ds, fit: dict, whiten: bool = False,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  out_col: str = "pca"):
    """Project the embedding column onto the fitted components —
    stateless vectorized map; ``whiten=True`` scales each projected
    coordinate to unit variance (ε-guarded for zero-variance
    directions). Returns a Dataset of ``(id_col, out_col)``."""
    import ray

    mean = fit["mean"]
    comps = fit["components"]
    scale = (1.0 / np.sqrt(np.maximum(fit["explained_variance"],
                                      1e-12))
             if whiten else None)
    ref = ray.put((mean, comps.T.copy(),
                   scale))  # (d, k) for the right-multiply

    def fn(t: pa.Table) -> pa.Table:
        mu, w, sc = ray.get(ref)
        x = _vec_matrix(t.column(vec_col), t.num_rows)
        y = (x - mu) @ w
        if sc is not None:
            y = y * sc
        k = y.shape[1]
        flat = pa.array(np.ascontiguousarray(y).ravel(),
                        type=pa.float64())
        return pa.table({
            id_col: t.column(id_col),
            out_col: pa.FixedSizeListArray.from_arrays(flat, k),
        })

    return emb_ds.select_columns([id_col, vec_col]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096)
