"""Keyword relevance scoring — TF-IDF / BM25 over the ``documents``
table, with distributed top-k retrieval.

Shape at 100 TB (the inverted-index build is the offline variant of
this; the online form is two streaming passes):

* pass 1 — corpus statistics: each block reduces to ONE row
  ``(n_docs, total_tokens, df_term0..df_termT)``; the driver sums P
  tiny rows. No shuffle; the per-term document frequencies are for the
  QUERY terms only (T is small), not the vocabulary.
* pass 2 — scoring: per-batch flat token explode (the
  ``functions/text.py`` kernel), one ``searchsorted`` against the
  sorted query-term array classifies every token, per-(doc, term)
  term frequencies come from one ``bincount`` — no per-row Python.
  Only docs that hit at least one term emit a row.
* top-k — per-block partial top-k (sort + head inside the map), then
  the driver merges P·k candidate rows. Ties break on doc_id so the
  result is deterministic and comparable to the SQL oracle.

BM25 (Robertson–Spärck Jones, the standard k1/b form) and plain
TF-IDF share the kernel; both are closed-form per (tf, df, dl) given
the pass-1 scalars, so the whole operator is SQL-expressible and the
pytest oracle value-checks scores, not just rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from centrality_gpu_ray.functions.text import (
    _explode_tokens, _segment_offsets)


def _classify(flat: np.ndarray, terms_sorted: np.ndarray) -> np.ndarray:
    """Token → query-term index (or -1). One searchsorted pass."""
    if flat.size == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.searchsorted(terms_sorted, flat)
    idx = np.minimum(idx, terms_sorted.size - 1)
    hit = terms_sorted[idx] == flat
    return np.where(hit, idx, -1)


def corpus_stats(ds, terms, text_col: str = "text") -> dict:
    """Pass 1: N docs, average doc length, per-term document
    frequency. Driver receives one row per block."""
    terms_sorted = np.sort(np.asarray(list(terms), dtype=object))
    T = terms_sorted.size
    if T == 0:
        raise ValueError("terms must be non-empty")

    def fn(batch: pd.DataFrame) -> pa.Table:
        text = batch[text_col].fillna("").str.strip()
        lists = text.str.split().to_list()
        flat, sizes = _explode_tokens(lists)
        tidx = _classify(flat, terms_sorted)
        doc_of = np.repeat(np.arange(sizes.size, dtype=np.int64), sizes)
        m = tidx >= 0
        # distinct (doc, term) pairs → df increments
        if m.any():
            pair = doc_of[m] * T + tidx[m]
            df = np.bincount(np.unique(pair) % T, minlength=T)
        else:
            df = np.zeros(T, dtype=np.int64)
        cols = {"n_docs": [len(batch)], "total_tokens": [int(sizes.sum())]}
        for t in range(T):
            cols[f"df_{t}"] = [int(df[t])]
        return pa.table(cols)

    fn.__name__ = "bm25_stats"
    t = ds.select_columns([text_col]).map_batches(
        fn, batch_format="pandas", batch_size=2048).to_pandas()
    n = int(t["n_docs"].sum())
    total = int(t["total_tokens"].sum())
    df = {str(terms_sorted[i]): int(t[f"df_{i}"].sum())
          for i in range(T)}
    return {"n_docs": n, "avgdl": total / max(1, n), "df": df,
            "terms_sorted": terms_sorted}


def _score_stage(ds, stats: dict, text_col: str, id_col: str,
                 mode: str, k1: float, b: float):
    terms_sorted = stats["terms_sorted"]
    T = terms_sorted.size
    n_docs = stats["n_docs"]
    avgdl = stats["avgdl"]
    dfv = np.array([stats["df"][str(t)] for t in terms_sorted],
                   dtype=np.float64)
    if mode == "bm25":
        # standard BM25 idf, floored at 0 (common Lucene-style clamp)
        idf = np.maximum(
            np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0), 0.0)
    else:
        idf = np.log(n_docs / np.maximum(dfv, 1.0))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].fillna("").str.strip()
        lists = text.str.split().to_list()
        flat, sizes = _explode_tokens(lists)
        tidx = _classify(flat, terms_sorted)
        nd = sizes.size
        doc_of = np.repeat(np.arange(nd, dtype=np.int64), sizes)
        m = tidx >= 0
        tf = np.zeros(nd * T, dtype=np.float64)
        if m.any():
            np.add.at(tf, doc_of[m] * T + tidx[m], 1.0)
        tf = tf.reshape(nd, T)
        dl = sizes.astype(np.float64)
        if mode == "bm25":
            denom = tf + (k1 * (1.0 - b + b * dl[:, None] /
                                max(avgdl, 1e-12)))
            score = (idf[None, :] * tf * (k1 + 1.0) / denom).sum(axis=1)
        else:
            score = (tf / np.maximum(dl, 1.0)[:, None]
                     * idf[None, :]).sum(axis=1)
        hit = score > 0.0
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[hit],
            "score": score[hit]})

    fn.__name__ = f"{mode}_score"
    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas", batch_size=2048)


def bm25_topk(ds, terms, k: int = 10, k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              mode: str = "bm25") -> pd.DataFrame:
    """Top-k docs by BM25 (or ``mode='tfidf'``) for a bag of query
    terms. Per-block partial top-k, driver merges P·k candidates;
    ties break ascending on id."""
    stats = corpus_stats(ds, terms, text_col)
    scored = _score_stage(ds, stats, text_col, id_col, mode, k1, b)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({id_col: np.array([], dtype=np.int64),
                             "score": np.array([], dtype=np.float64)})

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        # all-empty upstream blocks arrive schema-less (CLAUDE.md gotcha)
        if "score" not in batch.columns or len(batch) == 0:
            return _empty()
        return batch.sort_values(
            ["score", id_col], ascending=[False, True]).head(k)

    block_topk.__name__ = "block_topk"
    cand = scored.map_batches(
        block_topk, batch_format="pandas").to_pandas()
    if "score" not in cand.columns:
        return _empty()
    out = cand.sort_values(["score", id_col],
                           ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def bm25_oracle_sql(table_expr: str, terms, k: int, k1: float = 1.2,
                    b: float = 0.75) -> str:
    """DuckDB-equivalent BM25 top-k (same tokenizer regex, same idf
    clamp, same tie-break) for value-checking."""
    terms_list = ", ".join(f"('{t}')" for t in sorted(terms))
    return rf"""
WITH docs AS (SELECT doc_id, COALESCE(text, '') AS text FROM {table_expr}),
toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(TRIM(text), '\s+')) AS tok
  FROM docs WHERE LENGTH(TRIM(text)) > 0),
qterms(term) AS (VALUES {terms_list}),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
corpus AS (SELECT (SELECT COUNT(*) FROM docs) AS n,
                  (SELECT CAST(SUM(dl) AS DOUBLE) /
                          (SELECT COUNT(*) FROM docs) FROM dl) AS avgdl),
tf AS (SELECT doc_id, tok AS term, COUNT(*) AS tf FROM toks
       JOIN qterms ON tok = term GROUP BY doc_id, tok),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         SUM(GREATEST(LN((corpus.n - df.df + 0.5) / (df.df + 0.5) + 1.0),
                      0.0)
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / corpus.avgdl))
         ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), corpus
  GROUP BY tf.doc_id)
SELECT doc_id, score FROM scored WHERE score > 0
ORDER BY score DESC, doc_id ASC LIMIT {k}"""
