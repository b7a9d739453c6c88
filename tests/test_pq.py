"""Product quantization: exact-ADC special case (data ON the
codebook), recall vs brute force on blobs, partitioning invariance,
validation."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.functions.pq import (ann_pq_topk, pq_encode,
                                             pq_train)


def _emb_table(X: np.ndarray, ids=None) -> pa.Table:
    ids = np.arange(X.shape[0], dtype=np.int64) if ids is None else ids
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              type=pa.list_(pa.float64()))})


def _blobs(seed: int, n: int = 3000, d: int = 32, c: int = 12):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((c, d)) * 4.0
    lab = rng.integers(0, c, n)
    return centers[lab] + 0.3 * rng.standard_normal((n, d))


def test_adc_exact_when_data_on_codebook(ray_session):
    """Vectors built as concatenations of codewords PQ-encode losslessly,
    so ADC top-k == brute-force cosine top-k exactly."""
    from centrality_gpu_ray.functions.similarity import ann_brute_force

    # random UNIT codewords: every row is a concatenation of codewords
    # with uniform norm sqrt(m), so the normalized rows lie exactly on
    # the scaled codebook cb/sqrt(m) and PQ encoding is lossless;
    # generic directions → no score ties (per-block partial top-k
    # prunes exact ties arbitrarily in both engines, so a tie-heavy
    # construction cannot compare orderings). Distinct pick patterns
    # keep rows distinct.
    rng = np.random.default_rng(7)
    m, K, dsub = 4, 8, 8
    cb = rng.standard_normal((m, K, dsub))
    cb /= np.linalg.norm(cb, axis=2, keepdims=True)
    pat = rng.choice(K ** m, size=300, replace=False)
    picks = np.stack([(pat // K ** j) % K for j in range(m)], axis=1)
    X = np.concatenate([cb[j][picks[:, j]] for j in range(m)], axis=1)
    # every row has norm sqrt(m) — uniform, so normalized rows are
    # exactly (1/sqrt(m))·codewords and the scaled codebook cb/sqrt(m)
    # reproduces them losslessly
    cbn = cb / np.sqrt(m)
    ds = ray.data.from_arrow(_emb_table(X)).repartition(3)
    codes = pq_encode(ds, cbn)
    rng2 = np.random.default_rng(11)
    Qsel = rng2.integers(0, X.shape[0], 5)
    Q = X[Qsel] + 0.0
    got = ann_pq_topk(codes, cbn, Q, k=5).to_pandas()
    want = ann_brute_force(ds, Q, k=5).to_pandas()
    assert got.vec_id.tolist() == want.vec_id.tolist()
    assert np.allclose(got.score.to_numpy(), want.score.to_numpy(),
                       atol=1e-9)


def test_trained_self_retrieval(ray_session):
    """Trained-codebook quality on RANDOM data: every database vector,
    used as its own query, must land in its top-3 ADC hits (a vector
    shares its own code, so its ADC score is its reconstruction
    quality — this fails if training, encoding, or the LUT are off).
    Blob corpora are deliberately NOT used for recall: within a tight
    blob the exact top-10 is decided by noise-level cosine gaps below
    ANY quantizer's resolution."""
    rng = np.random.default_rng(3)
    X = rng.standard_normal((3000, 32))
    ds = ray.data.from_arrow(_emb_table(X)).repartition(4)
    cb = pq_train(ds, m=8, nbits=8, train_sample=2048, iters=10)
    assert cb.shape == (8, 256, 4)
    codes = pq_encode(ds, cb)
    out = ann_pq_topk(codes, cb, X[:40], k=3).to_pandas()
    hits = sum(1 for qi in range(40)
               if qi in set(out[out.query_id == qi].vec_id))
    assert hits >= 38, hits
    # compression: 32 float64 -> 8 bytes/vector
    first = next(iter(codes.iter_batches(batch_size=8,
                                         batch_format="pyarrow")))
    assert first.column("code").type == pa.list_(pa.uint8(), 8)


def test_partitioning_invariance(ray_session):
    X = _blobs(9, n=800)
    t = _emb_table(X)
    a_cb = pq_train(ray.data.from_arrow(t).repartition(1), m=4, nbits=5,
                    train_sample=800)
    b_cb = pq_train(ray.data.from_arrow(t).repartition(1), m=4, nbits=5,
                    train_sample=800)
    np.testing.assert_array_equal(a_cb, b_cb)
    ca = pq_encode(ray.data.from_arrow(t).repartition(1), a_cb) \
        .to_pandas().sort_values("vec_id")
    cb2 = pq_encode(ray.data.from_arrow(t).repartition(7), a_cb) \
        .to_pandas().sort_values("vec_id")
    assert [list(x) for x in ca.code] == [list(x) for x in cb2.code]
    qa = ann_pq_topk(pq_encode(ray.data.from_arrow(t).repartition(2),
                               a_cb), a_cb, X[:3], k=5).to_pandas()
    qb = ann_pq_topk(pq_encode(ray.data.from_arrow(t).repartition(5),
                               a_cb), a_cb, X[:3], k=5).to_pandas()
    assert qa.vec_id.tolist() == qb.vec_id.tolist()


def test_validation(ray_session):
    X = _blobs(1, n=100, d=30)
    ds = ray.data.from_arrow(_emb_table(X))
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(ds, m=8, train_sample=100)
    with pytest.raises(ValueError, match="nbits"):
        pq_train(ds, m=6, nbits=9, train_sample=100)
    cb = pq_train(ds, m=6, nbits=4, train_sample=100)
    with pytest.raises(ValueError, match="query dim"):
        ann_pq_topk(pq_encode(ds, cb), cb, np.ones((1, 31)))


def test_unsorted_query_ids_output_order(ray_session):
    X = _blobs(13, n=400)
    ds = ray.data.from_arrow(_emb_table(X)).repartition(2)
    cb = pq_train(ds, m=4, nbits=5, train_sample=400)
    codes = pq_encode(ds, cb)
    out = ann_pq_topk(codes, cb, X[:3], k=4,
                      query_ids=np.array([30, 10, 20])).to_pandas()
    assert out.query_id.tolist() == [10] * 4 + [20] * 4 + [30] * 4
    assert out["rank"].tolist() == [1, 2, 3, 4] * 3


def test_ivfpq_self_retrieval_and_invariance(ray_session):
    from centrality_gpu_ray.functions.pq import ann_ivfpq_topk

    rng = np.random.default_rng(21)
    X = rng.standard_normal((2500, 32))
    ds = ray.data.from_arrow(_emb_table(X)).repartition(4)
    out = ann_ivfpq_topk(ds, X[:30], k=3, nlist=16, nprobe=4, m=8,
                         nbits=8, train_sample=2000).to_pandas()
    hits = sum(1 for qi in range(30)
               if qi in set(out[out.query_id == qi].vec_id))
    assert hits >= 27, hits          # own list is always probed
    # partitioning invariance (tie-exact partials + deterministic merge)
    out2 = ann_ivfpq_topk(ray.data.from_arrow(_emb_table(X))
                          .repartition(9), X[:30], k=3, nlist=16,
                          nprobe=4, m=8, nbits=8,
                          train_sample=2000).to_pandas()
    assert out.vec_id.tolist() == out2.vec_id.tolist()


def test_ivfpq_exhaustive_probe_covers_every_vector(ray_session):
    from centrality_gpu_ray.functions.pq import ann_ivfpq_topk

    rng = np.random.default_rng(25)
    X = rng.standard_normal((600, 16))
    ds = ray.data.from_arrow(_emb_table(X)).repartition(3)
    out = ann_ivfpq_topk(ds, X[:10], k=5, nlist=8, nprobe=8, m=4,
                         nbits=6, train_sample=600).to_pandas()
    assert len(out) == 50
    hits = sum(1 for qi in range(10)
               if qi in set(out[out.query_id == qi].vec_id))
    assert hits == 10                # nprobe == nlist: nothing pruned
