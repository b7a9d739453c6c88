"""Co-occurrence graph construction: DuckDB value oracle over the
shared sha256-prefix id scheme, min_count, vocab mapping, and
composition with the graph engine."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines.textgraph import (cooccurrence_edges,
                                                    cooccurrence_graph,
                                                    token_vocab)

SF = "/root/testdata/sf0.001"


def _docs_table() -> pa.Table:
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "the dog and the fox",
            "   ",                      # whitespace-only: no tokens
            None,                       # null text
        ], type=pa.string()),
    })


def _oracle(docs: pa.Table, window: int, min_count: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", docs)
    return con.execute(f"""
        WITH base AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(
                       COALESCE(text, ''), '\\s+'), x -> x <> '') AS ws
            FROM documents
        ),
        expl AS (
            SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
            FROM base WHERE len(ws) > 0
        ),
        toks AS (
            SELECT doc_id, i,
                   CAST(CAST(('0x' || substr(sha256(ws[i]), 1, 15))
                             AS UBIGINT) AS BIGINT) AS tid
            FROM expl
        ),
        pairs AS (
            SELECT LEAST(a.tid, b.tid) AS src,
                   GREATEST(a.tid, b.tid) AS dst
            FROM toks a JOIN toks b
              ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND {window}
            WHERE a.tid <> b.tid
        )
        SELECT src, dst, COUNT(*) AS weight FROM pairs
        GROUP BY src, dst HAVING COUNT(*) >= {min_count}
        ORDER BY src, dst
    """).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df[["src", "dst", "weight"]].astype(np.int64)
            .sort_values(["src", "dst"]).reset_index(drop=True))


@pytest.mark.parametrize("window,min_count", [(1, 1), (2, 1), (3, 2)])
def test_edges_match_duckdb(window, min_count):
    docs = _docs_table()
    got = _norm(cooccurrence_edges(
        ray.data.from_arrow(docs).repartition(3), window=window,
        min_count=min_count, num_partitions=4).to_pandas())
    want = _norm(_oracle(docs, window, min_count))
    pd.testing.assert_frame_equal(got, want)
    assert (got["src"] < got["dst"]).all()
    assert (got["src"] > 0).all()  # 60-bit sha ids are positive


def test_edges_match_duckdb_on_sf_documents():
    docs_ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                                    columns=["doc_id", "text"])
    got = _norm(cooccurrence_edges(docs_ds, window=2,
                                   num_partitions=4).to_pandas())
    con = duckdb.connect()
    docs = pa.concat_tables(docs_ds.iter_batches(batch_size=None,
                                                 batch_format="pyarrow"))
    want = _norm(_oracle(docs, 2, 1))
    pd.testing.assert_frame_equal(got, want)


def test_token_vocab_roundtrip():
    import hashlib

    docs = _docs_table()
    vocab = token_vocab(ray.data.from_arrow(docs),
                        num_partitions=3).to_pandas()
    # exactly the distinct whitespace tokens, each under its sha id
    all_toks = set()
    for t in docs.column("text").to_pylist():
        if t:
            all_toks.update(t.split())
    assert set(vocab["token"]) == all_toks
    assert len(vocab) == len(all_toks)
    for _, row in vocab.iterrows():
        want = int(hashlib.sha256(
            row["token"].encode()).hexdigest()[:15], 16)
        assert int(row["node"]) == want


def test_graph_composition_textrank_shape():
    """cooccurrence_graph composes with the engine: weighted PageRank
    over it is TextRank — 'the' (the highest-co-occurrence token) must
    outrank a once-seen token."""
    import hashlib

    from centrality_gpu_ray.pipelines.pagerank import pagerank

    g = cooccurrence_graph(ray.data.from_arrow(_docs_table()), window=2,
                           config=EngineConfig(num_partitions=2),
                           mode="local")
    pr = pagerank(g, weighted=True)
    scores = dict(zip(pr.column("node").to_pylist(),
                      pr.column("pagerank").to_pylist()))
    tid = lambda t: int(hashlib.sha256(t.encode()).hexdigest()[:15], 16)
    assert scores[tid("the")] > scores[tid("jugs")]


def test_empty_corpus():
    docs = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                     "text": pa.array([None], type=pa.string())})
    out = cooccurrence_edges(ray.data.from_arrow(docs),
                             num_partitions=2)
    assert out.count() == 0
    with pytest.raises(ValueError, match="window"):
        cooccurrence_edges(ray.data.from_arrow(docs), window=0)
