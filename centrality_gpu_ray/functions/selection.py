"""DSIR-style data selection — importance weighting of raw documents
toward a target distribution via hashed n-gram features (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling";
public method, re-derived here for the Ray engine).

Spec (deterministic, independently re-implementable — the pytest
oracle is a from-scratch Counter/hashlib implementation):

* tokens: Python ``str.split()`` (ASCII corpora — same note as
  ``dedup.py::SimHasher``); features are unigrams plus bigrams joined
  with a single space.
* bucket(g) = first-16-hex-digits of sha256(g) mod ``buckets`` — the
  engine's DuckDB-reproducible hash family (``dedup._sha16_hash_tokens``),
  so a SQL oracle remains constructible.
* two multinomials over buckets with add-``smoothing`` Laplace:
  ``p_t`` from the (small, driver-held) target texts, ``p_r`` from the
  raw corpus — the raw pass streams ONE fixed-size count vector per
  block (B float64s, ~64 KB at the default 8192) and sums on the
  driver: O(blocks·B), never a per-doc matrix.
* per-doc importance log-weight = Σ_grams (log p_t − log p_r)[bucket]
  — computed as a gather + ``add.reduceat`` per batch against the
  broadcast log-ratio vector (``ray.put`` once, read per task).

``dsir_select`` keeps the top-k by log-weight (deterministic
doc_id tie-break): per-block partial top-k, tiny driver merge — no
global sort.  The 100 TB shape: the only driver state is the B-vector
and the k selected ids' (id, weight) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from centrality_gpu_ray.functions.dedup import _sha16_hash_tokens

_DEF_BUCKETS = 8192


def _gram_parts(texts, buckets: int):
    """Batch texts → ``(uni_b, big_b, sizes, nbig)`` bucket-id arrays
    (unigram stream in flat token order; bigram stream in adjacency
    order). One sha256 pass over the batch's unique unigrams and one
    over unique bigrams (the process-level cache in
    ``_sha16_hash_tokens`` makes repeated vocab nearly free)."""
    tok_lists = [t.split() for t in texts]
    sizes = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = np.asarray([w for ts in tok_lists for w in ts], dtype=object)
    nbig = np.maximum(sizes - 1, 0)
    if flat.size == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                sizes, nbig)
    uni_u, uni_inv = np.unique(flat, return_inverse=True)
    uni_b = (_sha16_hash_tokens(uni_u) % np.uint64(buckets)) \
        .astype(np.int64)[uni_inv]
    # bigrams within each doc: adjacent positions of the flat stream,
    # concatenated with the vectorized object-ufunc idiom (a per-pair
    # list comprehension is an interpreter loop on a benchmarked path)
    doc_of = np.repeat(np.arange(sizes.size), sizes)
    adj = np.flatnonzero(doc_of[1:] == doc_of[:-1])
    if adj.size:
        big = flat[adj] + " " + flat[adj + 1]
        big_u, big_inv = np.unique(big, return_inverse=True)
        big_b = (_sha16_hash_tokens(big_u) % np.uint64(buckets)) \
            .astype(np.int64)[big_inv]
    else:
        big_b = np.empty(0, np.int64)
    return uni_b, big_b, sizes, nbig


def _gram_buckets(texts, buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch texts → (per-doc-contiguous bucket-id stream,
    grams-per-doc) — unigrams (already in flat token order, no source
    gather) then bigrams within each doc's segment."""
    uni_b, big_b, sizes, nbig = _gram_parts(texts, buckets)
    n_grams = sizes + nbig
    out = np.empty(int(n_grams.sum()), dtype=np.int64)
    if out.size == 0:
        return out, n_grams
    pos = np.zeros(sizes.size + 1, dtype=np.int64)
    np.cumsum(n_grams, out=pos[1:])
    from centrality_gpu_ray.nputil import ragged_arange
    idx_u = np.repeat(pos[:-1], sizes) + ragged_arange(sizes)
    out[idx_u] = uni_b
    if big_b.size:
        idx_b = np.repeat(pos[:-1] + sizes, nbig) + ragged_arange(nbig)
        out[idx_b] = big_b
    return out, n_grams


def _bucket_counts(texts, buckets: int) -> np.ndarray:
    # counting needs no per-doc ordering — skip the interleave entirely
    uni_b, big_b, _, _ = _gram_parts(texts, buckets)
    return np.bincount(np.concatenate([uni_b, big_b]),
                       minlength=buckets).astype(np.float64)


def dsir_fit(ds, target_texts, text_col: str = "text",
             buckets: int = _DEF_BUCKETS, smoothing: float = 1.0) -> dict:
    """Fit the two hashed-n-gram multinomials → ``{"log_ratio",
    "buckets", "n_target_grams", "n_raw_grams"}``.  The raw pass is
    one streaming map emitting a B-vector per block."""
    if not smoothing > 0:
        # log(0) ratios would propagate -inf/NaN weights silently
        # (NaN lexsort keys drop docs from the top-k with no error) —
        # the docstring promises Laplace smoothing, enforce it
        raise ValueError(f"dsir_fit: smoothing must be > 0, "
                         f"got {smoothing}")
    tgt = _bucket_counts([t or "" for t in target_texts], buckets)

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column(text_col).to_pandas().fillna("").tolist()
        c = _bucket_counts(txt, buckets)
        return pa.table({"c": pa.array([c.tobytes()], type=pa.binary())})

    # bounded batch_size: np.unique's object argsort is superlinear —
    # 0.43 s/4096 docs but 0.75 s/4096-equivalent at 125k-doc blocks
    # (measured on the 2M demo corpus); unbounded block-sized batches
    # nearly double the whole fit pass
    raw = np.zeros(buckets)
    for b in ds.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow",
            batch_size=4096).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for v in b.column("c"):
            raw += np.frombuffer(v.as_py(), dtype=np.float64)
    s = float(smoothing)
    log_t = np.log(tgt + s) - np.log(tgt.sum() + s * buckets)
    log_r = np.log(raw + s) - np.log(raw.sum() + s * buckets)
    return {"log_ratio": log_t - log_r, "buckets": buckets,
            "n_target_grams": float(tgt.sum()),
            "n_raw_grams": float(raw.sum())}


def dsir_weights(ds, fit: dict, text_col: str = "text",
                 id_col: str = "doc_id"):
    """→ ``(doc_id, dsir_logw)`` rows; broadcast log-ratio, gather +
    reduceat per batch."""
    import ray

    ref = ray.put((np.asarray(fit["log_ratio"]), int(fit["buckets"])))

    def score(t: pa.Table) -> pa.Table:
        r, B = ray.get(ref)
        txt = t.column(text_col).to_pandas().fillna("").tolist()
        b, n_grams = _gram_buckets(txt, B)
        w = np.zeros(len(txt))
        nz = np.flatnonzero(n_grams)
        if nz.size:
            seg = np.zeros(nz.size, dtype=np.int64)
            np.cumsum(n_grams[nz][:-1], out=seg[1:])
            w[nz] = np.add.reduceat(r[b], seg)
        return pa.table({id_col: t.column(id_col).cast(pa.int64()),
                         "dsir_logw": pa.array(w)})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", batch_size=4096)


def dsir_select(ds, target_texts, k: int, text_col: str = "text",
                id_col: str = "doc_id", buckets: int = _DEF_BUCKETS,
                smoothing: float = 1.0):
    """Top-k raw docs by DSIR importance weight (ties broken by the
    smaller doc_id) → ``(doc_id, dsir_logw)`` pyarrow Table, sorted
    descending.  Per-block partial top-k then one tiny driver merge —
    the corpus never globally sorts."""
    fit = dsir_fit(ds, target_texts, text_col=text_col, buckets=buckets,
                   smoothing=smoothing)
    w = dsir_weights(ds, fit, text_col=text_col, id_col=id_col)

    def block_topk(t: pa.Table) -> pa.Table:
        ww = t.column("dsir_logw").to_numpy()
        ids = t.column(id_col).to_numpy()
        o = np.lexsort((ids, -ww))[:k]
        return pa.table({id_col: pa.array(ids[o]),
                         "dsir_logw": pa.array(ww[o])})

    parts = [b for b in w.map_batches(block_topk, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")]
    allp = pa.concat_tables(parts, promote_options="default") if parts \
        else pa.table({id_col: pa.array([], pa.int64()),
                       "dsir_logw": pa.array([], pa.float64())})
    ww = allp.column("dsir_logw").to_numpy()
    ids = allp.column(id_col).to_numpy()
    o = np.lexsort((ids, -ww))[:k]
    return pa.table({id_col: pa.array(ids[o]),
                     "dsir_logw": pa.array(ww[o])})
