"""Hashed n-gram language-model perplexity filtering — the CCNet-style
quality gate (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data"; public method re-derived
for the Ray engine — CCNet scores web text with a KenLM model trained
on a target corpus and keeps the low-perplexity head).

Deterministic, independently re-implementable spec (the pytest oracle
is a from-scratch Counter/hashlib implementation):

* tokens: Python ``str.split()`` (ASCII corpora — same note as
  ``selection.py``); a document is one token stream, no sentence
  splitting.
* hashed vocab: bucket_uni(w) = sha256-first-16-hex(w) mod ``buckets_uni``;
  bucket_big("a b") = same hash mod ``buckets_big`` (the engine's
  DuckDB-reproducible family, ``dedup._sha16_hash_tokens``).
* counts: ``U[Bu]`` over every token, ``G[Bb]`` over every adjacent
  in-document bigram; fit streams SPARSE (nonzero id, count) pairs per
  block and sums on the driver — O(blocks · nnz), never a per-doc
  matrix and never a shuffle.
* interpolated add-``smoothing`` model, natural log::

      p_uni(w)        = (U[bu(w)] + s) / (T + s·Bu),  T = ΣU
      p_big(w | prev) = (G[bb(prev w)] + s) / (U[bu(prev)] + s·Bu)
      p(w_i | w_{i-1}) = lam·p_big + (1−lam)·p_uni(w_i)

  doc logprob = log p_uni(w_1) + Σ_{i≥2} log p(w_i | w_{i-1});
  ``lm_log_ppl`` = −logprob / n_tokens (nats per token). Empty
  documents score NaN (they fail any ``<=`` threshold, i.e. are
  filtered — CCNet likewise drops empties).

The 100 TB shape: the model is two fixed-size vectors broadcast once
(``ray.put``); scoring is a stateless gather + ``add.reduceat`` per
batch; the filter is a pure map. Nothing shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.functions.dedup import _sha16_hash_tokens

_DEF_BUCKETS_UNI = 1 << 16
_DEF_BUCKETS_BIG = 1 << 20


def _lm_streams(texts, buckets_uni: int, buckets_big: int):
    """Batch texts → ``(uni_b, big_b, sizes)``: unigram bucket ids in
    flat token order, bigram bucket ids in adjacency order (doc-local),
    tokens per doc. One sha256 pass over the batch's unique unigrams
    and one over unique bigrams (process-level cache in
    ``_sha16_hash_tokens``)."""
    tok_lists = [t.split() for t in texts]
    sizes = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = np.asarray([w for ts in tok_lists for w in ts], dtype=object)
    if flat.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), sizes
    uni_u, uni_inv = np.unique(flat, return_inverse=True)
    uni_b = (_sha16_hash_tokens(uni_u) % np.uint64(buckets_uni)) \
        .astype(np.int64)[uni_inv]
    doc_of = np.repeat(np.arange(sizes.size), sizes)
    adj = np.flatnonzero(doc_of[1:] == doc_of[:-1])
    if adj.size:
        big = flat[adj] + " " + flat[adj + 1]
        big_u, big_inv = np.unique(big, return_inverse=True)
        big_b = (_sha16_hash_tokens(big_u) % np.uint64(buckets_big)) \
            .astype(np.int64)[big_inv]
    else:
        big_b = np.empty(0, np.int64)
    return uni_b, big_b, sizes


def _sparse_counts(ids: np.ndarray, buckets: int):
    """Bucket-id stream → (nonzero ids int64, counts int64)."""
    c = np.bincount(ids, minlength=buckets)
    nz = np.flatnonzero(c)
    return nz.astype(np.int64), c[nz].astype(np.int64)


def _partial_counts(texts, buckets_uni: int, buckets_big: int):
    uni_b, big_b, _ = _lm_streams(texts, buckets_uni, buckets_big)
    return (_sparse_counts(uni_b, buckets_uni),
            _sparse_counts(big_b, buckets_big))


def lm_fit(ds, text_col: str = "text",
           buckets_uni: int = _DEF_BUCKETS_UNI,
           buckets_big: int = _DEF_BUCKETS_BIG,
           smoothing: float = 0.5, lam: float = 0.8) -> dict:
    """Fit the hashed bigram LM over a (target/reference) corpus
    Dataset → ``{"uni", "big", "buckets_uni", "buckets_big",
    "smoothing", "lam", "n_tokens"}``.  One streaming pass; each block
    emits its sparse nonzero (id, count) pairs — a few MB per block,
    independent of corpus size — and the driver ``np.add.at``-folds
    them (duplicate-safe under ``iter_batches`` block coalescing)."""
    if not smoothing > 0:
        raise ValueError(f"lm_fit: smoothing must be > 0, got {smoothing}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lm_fit: lam must be in [0, 1], got {lam}")

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column(text_col).to_pandas().fillna("").tolist()
        (ui, uc), (bi, bc) = _partial_counts(txt, buckets_uni, buckets_big)
        return pa.table({
            "ui": pa.array([ui.tobytes()], type=pa.binary()),
            "uc": pa.array([uc.tobytes()], type=pa.binary()),
            "bi": pa.array([bi.tobytes()], type=pa.binary()),
            "bc": pa.array([bc.tobytes()], type=pa.binary())})

    U = np.zeros(buckets_uni, dtype=np.float64)
    G = np.zeros(buckets_big, dtype=np.float64)
    # bounded batch_size: np.unique's object argsort is superlinear
    # (same measurement as selection.py's dsir_fit)
    for b in ds.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow",
            batch_size=4096).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for ui, uc, bi, bc in zip(b.column("ui"), b.column("uc"),
                                  b.column("bi"), b.column("bc")):
            np.add.at(U, np.frombuffer(ui.as_py(), dtype=np.int64),
                      np.frombuffer(uc.as_py(), dtype=np.int64))
            np.add.at(G, np.frombuffer(bi.as_py(), dtype=np.int64),
                      np.frombuffer(bc.as_py(), dtype=np.int64))
    return {"uni": U, "big": G, "buckets_uni": buckets_uni,
            "buckets_big": buckets_big, "smoothing": float(smoothing),
            "lam": float(lam), "n_tokens": float(U.sum())}


def lm_fit_texts(texts, **kw) -> dict:
    """Driver-side convenience for a small in-memory target corpus
    (the common CCNet shape: the reference corpus is tiny next to the
    raw crawl). Same spec as :func:`lm_fit`."""
    import ray.data

    return lm_fit(ray.data.from_items(
        [{"text": t or ""} for t in texts]), text_col="text", **kw)


def _score_batch(texts, U, G, Bu, Bb, s, lam):
    """→ (n_tokens, logprob, log_ppl) float64 arrays, the spec above
    vectorized: one gather per stream + one ``add.reduceat`` per doc."""
    uni_b, big_b, sizes = _lm_streams(texts, Bu, Bb)
    n = sizes.size
    logprob = np.zeros(n, dtype=np.float64)
    T = U.sum()
    uni_den = T + s * Bu
    if uni_b.size:
        pos = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=pos[1:])
        has = sizes > 0
        # first token: unigram model
        logprob[has] = np.log((U[uni_b[pos[:-1][has]]] + s) / uni_den)
        nbig = np.maximum(sizes - 1, 0)
        if big_b.size:
            doc_of = np.repeat(np.arange(n), sizes)
            adj = np.flatnonzero(doc_of[1:] == doc_of[:-1])
            prev_b = uni_b[adj]
            cur_b = uni_b[adj + 1]
            p_big = (G[big_b] + s) / (U[prev_b] + s * Bu)
            p_uni = (U[cur_b] + s) / uni_den
            lp = np.log(lam * p_big + (1.0 - lam) * p_uni)
            nz = np.flatnonzero(nbig)
            seg = np.zeros(nz.size, dtype=np.int64)
            np.cumsum(nbig[nz][:-1], out=seg[1:])
            logprob[nz] += np.add.reduceat(lp, seg)
    with np.errstate(invalid="ignore", divide="ignore"):
        log_ppl = np.where(sizes > 0, -logprob / np.maximum(sizes, 1),
                           np.nan)
    return sizes, logprob, log_ppl


def _model_ref(fit: dict):
    """Broadcast the model once (``ray.put``); ship the count vectors
    as BYTES so workers rebuild heap-resident arrays (plasma-view
    gathers are ~2.6× slower on this substrate — BASELINE.md)."""
    import ray

    return ray.put((fit["uni"].tobytes(), fit["big"].tobytes(),
                    int(fit["buckets_uni"]), int(fit["buckets_big"]),
                    float(fit["smoothing"]), float(fit["lam"])))


_MODEL_CACHE: dict = {}


def _model_get(ref):
    """Per-process cache of the rebuilt heap arrays (task pools reuse
    workers; rebuilding 8 MB per batch would dominate small batches)."""
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    hit = _MODEL_CACHE.get(key)
    if hit is None:
        ub, gb, Bu, Bb, s, lam = ray.get(ref)
        hit = (np.frombuffer(ub, dtype=np.float64).copy(),
               np.frombuffer(gb, dtype=np.float64).copy(),
               Bu, Bb, s, lam)
        _MODEL_CACHE.clear()  # one model per worker is the hot case
        _MODEL_CACHE[key] = hit
    return hit


def lm_perplexity(ds, fit: dict, text_col: str = "text",
                  id_col: str = "doc_id"):
    """→ ``(doc_id, n_tokens, lm_logprob, lm_log_ppl)`` rows."""
    ref = _model_ref(fit)

    def score(t: pa.Table) -> pa.Table:
        U, G, Bu, Bb, s, lam = _model_get(ref)
        txt = t.column(text_col).to_pandas().fillna("").tolist()
        sizes, logprob, log_ppl = _score_batch(txt, U, G, Bu, Bb, s, lam)
        return pa.table({id_col: t.column(id_col).cast(pa.int64()),
                         "n_tokens": pa.array(sizes),
                         "lm_logprob": pa.array(logprob),
                         "lm_log_ppl": pa.array(log_ppl)})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", batch_size=4096)


def lm_filter(ds, fit: dict, max_log_ppl: float,
              text_col: str = "text"):
    """Keep documents with ``lm_log_ppl <= max_log_ppl`` (NaN — empty
    docs — never passes), attaching the score column; all other
    columns ride through. Pure stateless map: the CCNet "head" cut
    once a threshold is fixed (pair with
    ``sketch.filter_by_quantile`` over :func:`lm_perplexity` output to
    derive the threshold as a corpus percentile)."""
    ref = _model_ref(fit)
    thr = float(max_log_ppl)

    def keep(t: pa.Table) -> pa.Table:
        U, G, Bu, Bb, s, lam = _model_get(ref)
        txt = t.column(text_col).to_pandas().fillna("").tolist()
        _, _, log_ppl = _score_batch(txt, U, G, Bu, Bb, s, lam)
        mask = log_ppl <= thr  # NaN compares False
        out = t.filter(pa.array(mask))
        if "lm_log_ppl" in out.column_names:  # re-filtering scored output
            out = out.drop_columns(["lm_log_ppl"])
        return out.append_column("lm_log_ppl",
                                 pa.array(log_ppl[mask], pa.float64()))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=4096)
