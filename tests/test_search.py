"""BM25 / TF-IDF relevance scoring vs a same-semantics DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from centrality_gpu_ray.functions.search import (
    bm25_oracle_sql, bm25_topk, corpus_stats)

SF = "/root/testdata/sf0.01"
TERMS = ["data", "model", "the", "quantum"]


def _docs_ds():
    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])


def test_corpus_stats_vs_duckdb():
    stats = corpus_stats(_docs_ds(), TERMS)
    path = f"{SF}/documents.parquet"
    n, total = duckdb.execute(rf"""
        SELECT COUNT(*),
               SUM(LENGTH(regexp_split_to_array(TRIM(COALESCE(text, '')),
                                                '\s+'))
                   * (LENGTH(TRIM(COALESCE(text, ''))) > 0)::INT)
        FROM read_parquet('{path}')""").fetchone()
    assert stats["n_docs"] == n
    assert abs(stats["avgdl"] - total / n) < 1e-9
    for term, df in stats["df"].items():
        want = duckdb.execute(rf"""
            SELECT COUNT(DISTINCT doc_id) FROM (
              SELECT doc_id,
                     unnest(regexp_split_to_array(TRIM(text), '\s+')) AS tok
              FROM read_parquet('{path}')
              WHERE LENGTH(TRIM(COALESCE(text, ''))) > 0)
            WHERE tok = '{term}'""").fetchone()[0]
        assert df == want, term
    # stats are partitioning-invariant
    stats2 = corpus_stats(_docs_ds().repartition(9), TERMS)
    assert stats2["n_docs"] == stats["n_docs"]
    assert stats2["df"] == stats["df"]


def test_bm25_topk_matches_duckdb():
    got = bm25_topk(_docs_ds(), TERMS, k=25)
    want = duckdb.execute(bm25_oracle_sql(
        f"read_parquet('{SF}/documents.parquet')", TERMS, k=25)).fetchdf()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(got["score"].to_numpy(),
                       want["score"].to_numpy(), rtol=1e-9)


def test_tfidf_mode_and_zero_hit_query():
    got = bm25_topk(_docs_ds(), ["data"], k=5, mode="tfidf")
    assert len(got) == 5 and (got["score"] > 0).all()
    assert got["score"].is_monotonic_decreasing
    # a term absent from the corpus yields an empty result, not a crash
    miss = bm25_topk(_docs_ds(), ["zzzzunseenzzzz"], k=5)
    assert len(miss) == 0


def test_bm25_ranking_sanity_planted():
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["model model model", "model data", "nothing here",
                 "data " * 50 + "model"],
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = bm25_topk(ds, ["model"], k=4)
    # tf saturation: doc 0 (3x in 3 tokens) beats doc 1 (1x in 2) beats
    # the long doc 3 (1x in 51 tokens); doc 2 never appears
    assert got["doc_id"].tolist() == [0, 1, 3]
