"""Hashed TF-IDF document vectors — the text→vector bridge.

Closes the loop between the text operators and the vector operators:
``documents.text`` → fixed-dim ``list<float>`` embeddings that feed
the engine's ANN (``functions/similarity.py``), k-means
(``functions/clustering.py``) and SemDeDup (``functions/dedup.py``)
stages WITHOUT an external embedding model — the classic
feature-hashing ("hashing trick") vectorizer over whitespace tokens.

Determinism & oracle story: the token→bucket hash is the engine's
standard sha256-prefix family (first 15 hex chars, the same family the
fingerprint/split/minhash operators use — ``text.py:141``), so the
per-(doc, bucket) term counts are reproducible in ANSI SQL and
value-checked against DuckDB in the tests; the float idf/L2 steps are
serial-numpy-parity-tested.  Output is invariant to partitioning: the
DF pass folds exact integer per-block partials, and every per-doc
vector depends only on that global DF table and the doc's own text.

Scale shape: two streaming passes over the corpus.  Pass 1 emits one
``dim``-long int64 partial per block (document frequencies) — O(blocks·dim)
driver fold, no shuffle.  Pass 2 is a stateless map that carries the
tiny idf vector (dim·8 bytes) in its closure.  Per-batch work is
vectorized: one sha256 per UNIQUE token per batch, one ``np.add.at``
scatter for the counts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_PREFIX_HEX = 15  # 60-bit prefix — matches the fingerprint family


def _token_buckets(texts: list[str], dim: int):
    """All docs' tokens → (flat bucket ids, doc sizes). One sha256 per
    unique token per batch; the token stream itself stays vectorized."""
    tok_lists = [t.split() for t in texts]
    sizes = np.array([len(t) for t in tok_lists], dtype=np.int64)
    if int(sizes.sum()) == 0:
        return np.empty(0, dtype=np.int64), sizes
    flat = np.asarray([tok for toks in tok_lists for tok in toks],
                      dtype=object)
    uniq, inv = np.unique(flat, return_inverse=True)
    uh = np.fromiter(
        (int(hashlib.sha256(t.encode("utf-8")).hexdigest()[:_PREFIX_HEX], 16)
         for t in uniq),
        dtype=np.int64, count=uniq.size)
    return (uh % dim)[inv], sizes


def _doc_bucket_counts(texts: list[str], dim: int):
    """Dense (n_docs, dim) int64 term-count matrix for one batch."""
    buckets, sizes = _token_buckets(texts, dim)
    tf = np.zeros((sizes.size, dim), dtype=np.int64)
    if buckets.size:
        doc_idx = np.repeat(np.arange(sizes.size, dtype=np.int64), sizes)
        np.add.at(tf.reshape(-1), doc_idx * dim + buckets, 1)
    return tf


def document_frequencies(docs_ds, dim: int = 256,
                         text_col: str = "text") -> tuple[np.ndarray, int]:
    """(df, n_docs): per-bucket document frequency (int64, length
    ``dim``) and the corpus size — exact, partitioning-invariant."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        tf = _doc_bucket_counts(batch[text_col].fillna("").tolist(), dim)
        df_part = (tf > 0).sum(axis=0).astype(np.int64)
        return pd.DataFrame({"df": [df_part.tobytes()],
                             "n": [len(batch)]})

    df = np.zeros(dim, dtype=np.int64)
    n_docs = 0
    for b in docs_ds.map_batches(partial, batch_format="pandas",
                                 batch_size=4096).iter_batches(
            batch_size=None, batch_format="pandas"):
        for blob, n in zip(b["df"], b["n"]):
            df += np.frombuffer(blob, dtype=np.int64)
            n_docs += int(n)
    return df, n_docs


def hashed_tfidf(docs_ds, dim: int = 256, text_col: str = "text",
                 id_col: str = "doc_id", l2_normalize: bool = True):
    """Dataset of ``(doc_id, embedding)`` — ``embedding`` is a
    ``dim``-long ``list<float32>`` TF-IDF vector (smooth idf:
    ``ln((1+N)/(1+df)) + 1``; L2-normalized by default so downstream
    cosine == dot).  Empty/whitespace-only docs get the zero vector."""
    df, n_docs = document_frequencies(docs_ds, dim, text_col)
    idf = (np.log((1.0 + n_docs) / (1.0 + df)) + 1.0).astype(np.float64)

    def vectorize(batch: pd.DataFrame, _idf=idf) -> pa.Table:
        tf = _doc_bucket_counts(batch[text_col].fillna("").tolist(), dim)
        v = tf.astype(np.float64) * _idf[None, :]
        if l2_normalize:
            norms = np.linalg.norm(v, axis=1, keepdims=True)
            v = v / np.where(norms > 0.0, norms, 1.0)
        v32 = v.astype(np.float32)
        return pa.table({
            id_col: pa.array(batch[id_col].to_numpy().astype(np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(v32.reshape(-1)), dim),
        })

    return docs_ds.map_batches(vectorize, batch_format="pandas",
                               batch_size=4096)
