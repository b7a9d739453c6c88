"""Owner-resident SGNS trainer: parity vs the dense trainer, chunking
invariance, and the Dataset emitter layout."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from centrality_gpu_ray.pipelines.embeddings import (
    _init_matrix, sgns_collect, sgns_embeddings_dataset, sgns_train,
    sgns_train_sharded)


def _pairs_ds(centers, contexts, parts=3):
    t = pa.table({"center": pa.array(centers, type=pa.int64()),
                  "context": pa.array(contexts, type=pa.int64())})
    return rd.from_arrow(t).repartition(parts)


def _rand_pairs(seed, n, m):
    rng = np.random.RandomState(seed)
    c = rng.randint(0, n, m)
    x = (c + 1 + rng.randint(0, n - 1, m)) % n
    return c, x


def test_sharded_matches_dense_trainer(ray_session):
    n, m = 40, 600
    c, x = _rand_pairs(7, n, m)
    dense = sgns_train(_pairs_ds(c, x), n, dim=6, neg=3, iters=4,
                       lr=0.4, seed=3)
    fit = sgns_train_sharded(_pairs_ds(c, x, parts=5), n, dim=6, neg=3,
                             iters=4, lr=0.4, seed=3)
    w_in, w_out = sgns_collect(fit["pool"])
    # identical math + identical init; only cross-block float
    # association differs between the driver fold and the owner folds
    np.testing.assert_allclose(w_in, dense["w_in"], atol=1e-9)
    np.testing.assert_allclose(w_out, dense["w_out"], atol=1e-9)
    np.testing.assert_allclose(fit["loss"], dense["loss"], rtol=1e-9)
    assert fit["n_pairs"] == m
    fit["pool"].shutdown()


def test_sharded_chunk_invariance(ray_session):
    # internal task chunk size must not change the result beyond float
    # association (in-chunk combine happens at different granularity)
    n, m = 25, 300
    c, x = _rand_pairs(11, n, m)
    a = sgns_train_sharded(_pairs_ds(c, x, parts=2), n, dim=4, neg=2,
                           iters=3, lr=0.3, seed=5, chunk=37)
    b = sgns_train_sharded(_pairs_ds(c, x, parts=6), n, dim=4, neg=2,
                           iters=3, lr=0.3, seed=5, chunk=4096)
    wa, _ = sgns_collect(a["pool"])
    wb, _ = sgns_collect(b["pool"])
    np.testing.assert_allclose(wa, wb, atol=1e-9)
    a["pool"].shutdown()
    b["pool"].shutdown()


def test_sharded_empty_pairs(ray_session):
    fit = sgns_train_sharded(_pairs_ds([], []), 5, dim=4, iters=2,
                             seed=1)
    assert fit["n_pairs"] == 0 and fit["loss"] == []
    w_in, w_out = sgns_collect(fit["pool"])
    np.testing.assert_allclose(w_in, _init_matrix(5, 4, 1))
    assert (w_out == 0).all()
    fit["pool"].shutdown()


def test_embeddings_dataset_emitter(ray_session):
    n, m = 12, 100
    c, x = _rand_pairs(3, n, m)
    fit = sgns_train_sharded(_pairs_ds(c, x), n, dim=5, neg=2, iters=2,
                             seed=2)
    ds = sgns_embeddings_dataset(fit["pool"])
    pdf = ds.to_pandas().sort_values("node").reset_index(drop=True)
    assert list(pdf["node"]) == list(range(n))
    w_in, _ = sgns_collect(fit["pool"])
    got = np.stack(pdf["embedding"].to_numpy())
    np.testing.assert_allclose(got, w_in)
    fit["pool"].shutdown()
