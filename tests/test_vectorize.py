"""Hashed TF-IDF vectorizer: serial parity, partitioning invariance,
DuckDB bucket-count parity, ANN integration."""
import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from centrality_gpu_ray.functions.vectorize import (document_frequencies,
                                                    hashed_tfidf)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox jumps over the lazy dog",   # exact dup of 0
    "sphinx of black quartz judge my vow",
    "",
    "   ",
    "singleton",
    "five dozen liquor jugs pack my box with quick additions",
]


def _docs_table(texts=TEXTS) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(range(100, 100 + len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())})


def _bucket(tok: str, dim: int) -> int:
    return int(hashlib.sha256(tok.encode()).hexdigest()[:15], 16) % dim


def _serial_tfidf(texts, dim, l2=True):
    tf = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        for tok in t.split():
            tf[i, _bucket(tok, dim)] += 1
    df = (tf > 0).sum(axis=0)
    idf = np.log((1 + len(texts)) / (1 + df)) + 1
    v = tf * idf[None, :]
    if l2:
        nrm = np.linalg.norm(v, axis=1, keepdims=True)
        v = v / np.where(nrm > 0, nrm, 1)
    return v.astype(np.float32)


def _collect(ds, dim):
    rows = {}
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        ids = b.column("doc_id").to_numpy()
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vecs = col.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)
        for i, d in enumerate(ids):
            rows[int(d)] = vecs[i]
    return rows


def test_serial_parity(ray_session):
    dim = 64
    ds = ray.data.from_arrow(_docs_table()).repartition(3)
    got = _collect(hashed_tfidf(ds, dim=dim), dim)
    want = _serial_tfidf(TEXTS, dim)
    for i in range(len(TEXTS)):
        np.testing.assert_array_equal(got[100 + i], want[i])


def test_partitioning_invariance(ray_session):
    dim = 32
    t = _docs_table()
    a = _collect(hashed_tfidf(ray.data.from_arrow(t).repartition(1),
                              dim=dim), dim)
    b = _collect(hashed_tfidf(ray.data.from_arrow(t).repartition(6),
                              dim=dim), dim)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_df_counts_match_duckdb(ray_session):
    dim = 16
    ds = ray.data.from_arrow(_docs_table())
    df, n = document_frequencies(ds, dim=dim)
    assert n == len(TEXTS)
    con = duckdb.connect()
    con.register("documents", _docs_table().to_pandas())
    want = con.sql(f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                COALESCE(text, ''), '\\s+'), x -> x <> '')) AS tok
            FROM documents),
        buckets AS (
            SELECT DISTINCT doc_id,
                CAST(CAST(('0x' || substr(sha256(tok), 1, 15)) AS UBIGINT)
                     % {dim} AS BIGINT) AS b
            FROM toks)
        SELECT b, COUNT(*) AS df FROM buckets GROUP BY b""").df()
    want_vec = np.zeros(dim, dtype=np.int64)
    want_vec[want["b"].to_numpy()] = want["df"].to_numpy()
    np.testing.assert_array_equal(df, want_vec)


def test_dup_and_similar_docs_via_ann(ray_session):
    """End-to-end text→vector→ANN: the exact duplicate is the top-1
    cosine hit at similarity 1.0; the scrambled near-dup of doc 1
    ranks above unrelated docs."""
    from centrality_gpu_ray.functions.similarity import ann_brute_force

    dim = 128
    ds = ray.data.from_arrow(_docs_table()).repartition(2)
    vecs = hashed_tfidf(ds, dim=dim)
    emb = vecs.map_batches(
        lambda t: pa.table({"vec_id": t.column("doc_id"),
                            "embedding": t.column("embedding")}),
        batch_format="pyarrow")
    by_id = _collect(vecs, dim)
    queries = np.stack([by_id[100], by_id[101]])
    out = ann_brute_force(emb, queries, k=3,
                          query_ids=np.array([100, 101])).to_pandas()
    q0 = out[out.query_id == 100]
    # doc 100 and its dup 102 tie at cosine 1.0 (ties → min vec_id)
    assert list(q0.vec_id[:2]) == [100, 102]
    assert np.allclose(q0.score[:2], 1.0, atol=1e-6)
    q1 = out[out.query_id == 101]
    assert list(q1.vec_id[:2]) == [101, 107]  # scrambled superset next


def test_zero_vector_for_empty_docs(ray_session):
    dim = 8
    got = _collect(hashed_tfidf(
        ray.data.from_arrow(_docs_table()), dim=dim), dim)
    np.testing.assert_array_equal(got[104], np.zeros(dim, np.float32))
    np.testing.assert_array_equal(got[105], np.zeros(dim, np.float32))
