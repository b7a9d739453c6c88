"""Distributed PCA: numpy-oracle parity, partitioning invariance,
whitening, and the embeddings-table integration."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.functions.decomposition import (pca_fit,
                                                        pca_transform)


def _emb_table(x: np.ndarray) -> pa.Table:
    n, d = x.shape
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.ravel().astype(np.float64)), d),
    })


def _oracle(x: np.ndarray, k: int):
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    comps = evecs[:, order].T
    piv = np.argmax(np.abs(comps), axis=1)
    sg = np.sign(comps[np.arange(comps.shape[0]), piv])
    sg[sg == 0] = 1.0
    return mu, comps * sg[:, None], np.maximum(evals[order], 0.0)


def test_fit_matches_numpy_oracle(ray_session):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((400, 8)) @ rng.standard_normal((8, 8)) \
        + rng.standard_normal(8) * 3
    for parts in (1, 7):
        fit = pca_fit(ray.data.from_arrow(_emb_table(x))
                      .repartition(parts), n_components=5)
        mu, comps, evals = _oracle(x, 5)
        np.testing.assert_allclose(fit["mean"], mu, atol=1e-9)
        np.testing.assert_allclose(fit["explained_variance"],
                                   evals[:5], atol=1e-9)
        np.testing.assert_allclose(fit["components"], comps[:5],
                                   atol=1e-8)
        assert fit["n_rows"] == 400


def test_transform_and_whiten(ray_session):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((300, 6)) * np.array([5, 3, 1, 1, .5, .1])
    ds = ray.data.from_arrow(_emb_table(x)).repartition(4)
    fit = pca_fit(ds, n_components=4)
    out = pca_transform(ds, fit).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    y = np.stack(out["pca"].to_numpy())
    assert y.shape == (300, 4)
    # projected coordinates have the fitted variances, zero mean
    np.testing.assert_allclose(y.mean(axis=0), 0, atol=1e-9)
    np.testing.assert_allclose(y.var(axis=0, ddof=1),
                               fit["explained_variance"], atol=1e-9)
    # whitened: unit variance on every kept component
    w = pca_transform(ds, fit, whiten=True).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    yw = np.stack(w["pca"].to_numpy())
    np.testing.assert_allclose(yw.var(axis=0, ddof=1),
                               np.ones(4), atol=1e-6)


def test_embeddings_parquet_integration(ray_session):
    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    fit = pca_fit(ds, n_components=8)
    assert fit["components"].shape[0] == 8
    assert (np.diff(fit["explained_variance"]) <= 1e-9).all()
    out = pca_transform(ds, fit, whiten=True)
    assert out.count() == ds.count()


def test_too_few_rows_rejected(ray_session):
    with pytest.raises(ValueError, match="at least 2"):
        pca_fit(ray.data.from_arrow(
            _emb_table(np.ones((1, 4)))), n_components=2)
