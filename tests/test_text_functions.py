"""Text analysis operators over the documents table."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.functions.text import (
    TextAnalyzer, fingerprints, language_id, quality_scores, token_stats)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])


def test_token_stats_matches_python(docs):
    out = token_stats(docs).to_pandas().sort_values("doc_id")
    raw = docs.to_pandas().sort_values("doc_id")
    expect = raw["text"].fillna("").str.strip().map(lambda t: len(t.split()) if t else 0)
    assert out["n_tokens"].tolist() == expect.tolist()
    assert (out["n_chars"] == raw["text"].str.len()).all()
    assert (out["n_bpeish_tokens"] >= out["n_tokens"]).all()


def test_quality_scores_bounded(docs):
    out = quality_scores(docs).to_pandas()
    for col in ["len_score", "punct_ratio", "stopword_ratio", "alpha_ratio", "quality"]:
        assert (out[col] >= 0).all(), col
    assert (out["quality"] <= 1.0 + 1e-9).all()
    assert out["quality"].nunique() > 1


def test_language_id_on_known_samples():
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "the cat and the dog sat in a corner of the house that is it",
            "der Hund und die Katze das ist nicht ein Problem zu haben mit",
            "le chat et la maison est un endroit que je ne connais pas",
            "xqz zzz qqq",  # no function words → und
        ]),
    })
    out = language_id(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert out["pred_lang"].tolist() == ["en", "de", "fr", "und"]
    assert (out["confidence"] >= 0).all()


def test_fingerprints_deterministic_whitespace_robust():
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["hello world foo", "hello   world\tfoo", "hello world bar"]),
    })
    out = fingerprints(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    fp = out["fingerprint"].tolist()
    assert fp[0] == fp[1]  # whitespace-insensitive
    assert fp[0] != fp[2]
    out2 = fingerprints(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert out["fingerprint"].tolist() == out2["fingerprint"].tolist()


def test_analyzer_smoke_direct():
    # actor __init__ errors surface late in pools — smoke the class directly
    a = TextAnalyzer()
    df = pd.DataFrame({"doc_id": [1], "text": ["Hello, world! 42"]})
    assert a.token_stats(df)["n_tokens"].iloc[0] == 3
    assert a.token_stats(df)["n_bpeish_tokens"].iloc[0] == 5  # Hello , world ! 42


def test_vocab_topk_matches_duckdb_oracle(docs):
    import duckdb

    from centrality_gpu_ray.functions.text import vocab_topk

    k = 50
    out = vocab_topk(docs, k=k, num_partitions=8)
    con = duckdb.connect()
    con.register("documents", docs.to_pandas())
    oracle = con.execute(r"""
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(TRIM(text), '\s+')) AS token
          FROM documents
          WHERE LENGTH(TRIM(COALESCE(text, ''))) > 0
        ), c AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS count
          FROM toks GROUP BY token
        )
        SELECT token, count,
               ROW_NUMBER() OVER (ORDER BY count DESC, token) AS rank
        FROM c ORDER BY rank LIMIT 50""").fetch_df()
    got = out.to_pandas()
    assert got["token"].tolist() == oracle["token"].tolist()
    assert got["count"].tolist() == oracle["count"].tolist()
    assert got["rank"].tolist() == oracle["rank"].tolist()


def test_vocab_topk_partitioning_invariant(docs):
    from centrality_gpu_ray.functions.text import vocab_topk

    a = vocab_topk(docs, k=20, num_partitions=4).to_pandas()
    b = vocab_topk(docs.repartition(9), k=20,
                   num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_corpus_report_vs_duckdb():
    import duckdb
    import ray.data

    from centrality_gpu_ray.functions.text import corpus_report

    sf = "/root/testdata/sf0.01"
    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"])
    got = corpus_report(docs).to_pandas() \
        .sort_values(["source", "lang"]).reset_index(drop=True)
    want = duckdb.execute(rf"""
        SELECT source, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN LENGTH(TRIM(COALESCE(text,''))) = 0
                        THEN 0 ELSE LENGTH(regexp_split_to_array(
                             TRIM(text), '\s+')) END) AS BIGINT)
                   AS n_tokens,
               CAST(SUM(LENGTH(COALESCE(text, ''))) AS BIGINT) AS n_chars
        FROM read_parquet('{sf}/documents.parquet')
        GROUP BY source, lang ORDER BY source, lang""").fetch_df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # partitioning invariance (combine-then-aggregate is exact)
    got2 = corpus_report(docs.repartition(9)).to_pandas() \
        .sort_values(["source", "lang"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()],
                                  got2[want.columns.tolist()])
