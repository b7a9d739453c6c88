"""Text analysis over the ``documents`` table — language-ID, quality
scoring, token counting, document fingerprinting.

These are the per-document operators a 100 TB training-data pipeline
runs at ingest, alongside the graph engine's sha256 stage. All run as
TASK-pool ``map_batches`` stages with the compiled regex/profile state
cached once per worker process (an actor pool here paid seconds of
actor spawn per call — far more than the compute; process-level caching
gives the same setup-once guarantee). Bodies are vectorized: tokens are
exploded ONCE per batch into a flat array with per-doc segment offsets,
and every per-doc statistic is a ``reduceat``/``bincount`` over those
segments — no per-row Python in the hot path. The reference engine has
no string functions at all (SURVEY.md §2.7) — this module is pure
new-engine surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Tiny per-language stopword/character profiles for the n-gram heuristic
# language-ID (public-knowledge function words; intentionally minimal —
# the operator contract is "deterministic heuristic", not a model).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ich", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "je", "que", "pas"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "que", "no", "en"},
    "pt": {"o", "a", "os", "e", "é", "um", "uma", "que", "não", "em"},
    "it": {"il", "la", "i", "e", "è", "un", "una", "che", "non", "per"},
}

_FNV_PRIME = np.uint64(1099511628211)
_FNV_BASIS = np.uint64(1469598103934665603)


def _explode_tokens(tok_lists: list) -> tuple[np.ndarray, np.ndarray]:
    """Token lists → (flat object array, tokens-per-doc). One pass."""
    sizes = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = np.asarray([tok for toks in tok_lists for tok in toks],
                      dtype=object)
    return flat, sizes


def _segment_offsets(sizes: np.ndarray) -> np.ndarray:
    nz = np.flatnonzero(sizes)
    seg = np.zeros(nz.size, dtype=np.int64)
    np.cumsum(sizes[nz][:-1], out=seg[1:])
    return seg


class TextAnalyzer:
    """Compiled regexes + sorted profile arrays, built once per process."""

    def __init__(self):
        import re

        self.ws = re.compile(r"\s+")
        # BPE-ish word/number/punct splitter (GPT-2-style coarse classes)
        self.bpe = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
        self.word = re.compile(r"[a-zA-Z]{1,}")
        self.punct = re.compile(r"[.,;:!?]")
        self.langs = sorted(_LANG_PROFILES)  # sorted → deterministic ties
        self.profiles = {k: np.sort(np.asarray(sorted(_LANG_PROFILES[k]),
                                               dtype=object))
                         for k in self.langs}

    # -- token counting ---------------------------------------------------
    def token_stats(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        out = pd.DataFrame({"doc_id": batch["doc_id"]})
        out["n_chars"] = text.str.len().astype("int64")
        # whitespace tokens — matches the DuckDB oracle
        # len(regexp_split_to_array(trim(text), '\s+'))
        stripped = text.str.strip()
        out["n_tokens"] = np.where(
            stripped.str.len() == 0, 0,
            stripped.str.split(self.ws).str.len()).astype("int64")
        out["n_bpeish_tokens"] = text.str.findall(self.bpe).str.len().astype("int64")
        return out

    # -- quality scoring --------------------------------------------------
    def quality(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        tok_lists = text.str.lower().str.findall(self.word).tolist()
        flat, sizes = _explode_tokens(tok_lists)
        n_words = np.maximum(sizes, 1).astype(np.float64)
        ndocs = sizes.size

        stop_hits = np.zeros(ndocs, dtype=np.int64)
        mean_wlen = np.zeros(ndocs, dtype=np.float64)
        nz = np.flatnonzero(sizes)
        if nz.size:
            seg = _segment_offsets(sizes)
            hits = np.isin(flat, self.profiles["en"]).astype(np.int64)
            stop_hits[nz] = np.add.reduceat(hits, seg)
            wlens = np.fromiter(map(len, flat), count=flat.size,
                                dtype=np.int64)
            mean_wlen[nz] = np.add.reduceat(wlens, seg) / sizes[nz]

        n_chars = text.str.len().clip(lower=1)
        out = pd.DataFrame({"doc_id": batch["doc_id"]})
        out["len_score"] = np.clip(text.str.len() / 1000.0, 0.0, 1.0)
        out["punct_ratio"] = text.str.count(self.punct) / n_chars
        out["stopword_ratio"] = stop_hits / n_words
        out["mean_word_len"] = mean_wlen
        out["alpha_ratio"] = text.str.count(r"[A-Za-z]") / n_chars
        out["quality"] = (
            0.3 * out["len_score"]
            + 0.3 * out["alpha_ratio"]
            + 0.2 * (1.0 - (out["punct_ratio"] * 5).clip(0, 1))
            + 0.2 * out["stopword_ratio"].clip(0, 0.5) * 2
        )
        return out

    # -- language id ------------------------------------------------------
    def lang_id(self, batch: pd.DataFrame) -> pd.DataFrame:
        tok_lists = batch["text"].fillna("").str.lower() \
            .str.findall(self.word).tolist()
        flat, sizes = _explode_tokens(tok_lists)
        ndocs = sizes.size
        scores = np.zeros((ndocs, len(self.langs)), dtype=np.float64)
        nz = np.flatnonzero(sizes)
        if nz.size:
            seg = _segment_offsets(sizes)
            n = np.maximum(sizes[nz], 1).astype(np.float64)
            for j, lang in enumerate(self.langs):
                hits = np.isin(flat, self.profiles[lang]).astype(np.int64)
                scores[nz, j] = np.add.reduceat(hits, seg) / n
        best_j = np.argmax(scores, axis=1)  # first max → sorted-lang ties
        best = scores[np.arange(ndocs), best_j]
        langs = np.where(best >= 0.05,
                         np.asarray(self.langs, dtype=object)[best_j], "und")
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "pred_lang": langs.astype(object),
                             "confidence": np.round(best, 6)})

    # -- fingerprinting ---------------------------------------------------
    def fingerprint(self, batch: pd.DataFrame) -> pd.DataFrame:
        """64-bit polynomial token hash — deterministic, order-sensitive,
        whitespace-jitter-robust: fp = basis ⊕ Σ (h(tok_i)+1)·P^(n-1-i)
        (mod 2^64), vectorized over all docs via one reduceat. The token
        hash h is the first 15 hex chars of sha256(token) — chosen to be
        reproducible in ANSI SQL (DuckDB ``sha256``), so the whole
        fingerprint is oracle-checkable; only the per-batch VOCABULARY
        (unique tokens) pays a Python hash call, the token stream stays
        vectorized."""
        import hashlib

        tok_lists = [t.split() for t in batch["text"].fillna("")]
        sizes = np.array([len(t) for t in tok_lists], dtype=np.int64)
        fps = np.full(sizes.size, _FNV_BASIS, dtype=np.uint64)
        nz = np.flatnonzero(sizes)
        if nz.size:
            flat = np.asarray([tok for toks in tok_lists for tok in toks],
                              dtype=object)
            uniq, inv = np.unique(flat, return_inverse=True)
            uh = np.fromiter(
                (int(hashlib.sha256(t.encode("utf-8")).hexdigest()[:15], 16)
                 for t in uniq),
                dtype=np.uint64, count=uniq.size)
            th = uh[inv] + np.uint64(1)
            # P^k mod 2^64 table (u64 multiply wraps naturally)
            maxlen = int(sizes.max())
            pows = np.ones(maxlen, dtype=np.uint64)
            if maxlen > 1:
                np.multiply.accumulate(
                    np.full(maxlen - 1, _FNV_PRIME, dtype=np.uint64),
                    out=pows[1:])
            seg = _segment_offsets(sizes)
            pos = np.arange(flat.size, dtype=np.int64) - np.repeat(seg, sizes[nz])
            weight = pows[np.repeat(sizes[nz], sizes[nz]) - 1 - pos]
            fps[nz] = _FNV_BASIS ^ np.add.reduceat(th * weight, seg)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "fingerprint": fps.view(np.int64),
        })


_ANALYZER: TextAnalyzer | None = None


def _analyzer() -> TextAnalyzer:
    global _ANALYZER
    if _ANALYZER is None:
        _ANALYZER = TextAnalyzer()
    return _ANALYZER


def _stage(ds, method: str, concurrency: int | None = None,
           batch_size: int = 2048):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return getattr(_analyzer(), method)(batch)

    fn.__name__ = f"text_{method}"
    return ds.map_batches(fn, batch_format="pandas", batch_size=batch_size)


def token_stats(ds, **kw):
    return _stage(ds.select_columns(["doc_id", "text"]), "token_stats", **kw)


def quality_scores(ds, **kw):
    return _stage(ds.select_columns(["doc_id", "text"]), "quality", **kw)


def language_id(ds, **kw):
    return _stage(ds.select_columns(["doc_id", "text"]), "lang_id", **kw)


def fingerprints(ds, **kw):
    return _stage(ds.select_columns(["doc_id", "text"]), "fingerprint", **kw)


# -- vocabulary ------------------------------------------------------------

def _vocab_partial(batch: pd.DataFrame) -> "pa.Table":
    """Map-side combine: collapse a batch to (unique token, count).

    The 100 TB-critical step — a batch of thousands of documents
    reduces to its distinct-token histogram BEFORE the shuffle, so the
    exchange moves vocabulary-sized rows, not corpus-sized ones.
    Whitespace tokens, the same rule as ``token_stats`` / the DuckDB
    ``regexp_split_to_array(TRIM(text), '\\s+')`` oracle."""
    import pyarrow as pa

    text = batch["text"].fillna("").str.strip()
    toks = text[text.str.len() > 0].str.split(_analyzer().ws)
    flat = np.asarray(
        [t for lst in toks for t in lst], dtype=object)
    if flat.size == 0:
        return pa.table({"token": pa.array([], type=pa.string()),
                         "count": pa.array([], type=pa.int64())})
    uniq, cnt = np.unique(flat, return_counts=True)
    return pa.table({"token": pa.array(uniq, type=pa.string()),
                     "count": pa.array(cnt.astype(np.int64))})


def _block_topk(tbl: "pa.Table", k: int) -> "pa.Table":
    import pyarrow as pa

    if tbl.num_rows <= k:
        return tbl
    cnt = tbl.column("count").to_numpy()
    tok = tbl.column("token").to_numpy(zero_copy_only=False)
    order = np.lexsort((tok, -cnt))[:k]  # count desc, token asc
    return tbl.take(pa.array(order))


def vocab_topk(ds, k: int = 1000, num_partitions: int = 32) -> "pa.Table":
    """Exact global top-k token frequencies → ``(token, count, rank)``.

    Shape at scale: map-side combine per batch (``_vocab_partial``),
    one hash shuffle keyed on the token (``hash_aggregate``), then
    per-block candidate top-k. After the hash aggregate every token
    appears in EXACTLY ONE output row (keys are hash-disjoint across
    partitions and combined within), so per-block top-k → driver merge
    of ≤ blocks·k candidate rows → final top-k is exact, never a full
    sort. Ties break (count desc, token asc): numpy code-point order ==
    DuckDB's binary UTF-8 collation (UTF-8 preserves code-point order),
    so ranks are value-checkable by SQL ROW_NUMBER().
    """
    import pyarrow as pa

    from centrality_gpu_ray.stages.shuffle import hash_aggregate

    pre = ds.select_columns(["doc_id", "text"]).map_batches(
        _vocab_partial, batch_format="pandas", batch_size=2048)
    agg = hash_aggregate(pre, ["token"], [("count", "sum")],
                         num_partitions=num_partitions)
    cand = agg.map_batches(lambda t: _block_topk(t, k),
                           batch_format="pyarrow")
    parts = list(cand.iter_batches(batch_size=None, batch_format="pyarrow"))
    schema = pa.schema([("token", pa.string()), ("count", pa.int64())])
    merged = (pa.concat_tables([p.select(["token", "count"]) for p in parts])
              if parts else schema.empty_table())
    final = _block_topk(merged, k)
    cnt = final.column("count").to_numpy()
    tok = final.column("token").to_numpy(zero_copy_only=False)
    order = np.lexsort((tok, -cnt))
    return pa.table({
        "token": pa.array(tok[order], type=pa.string()),
        "count": pa.array(cnt[order].astype(np.int64)),
        "rank": pa.array(np.arange(1, order.size + 1, dtype=np.int64)),
    })


# -- corpus composition report ----------------------------------------------

def corpus_report(ds, group_cols: list[str] | None = None,
                  text_col: str = "text", num_partitions: int = 8):
    """Per-(source, lang) corpus composition — the mixture dashboard a
    curation run publishes: document counts, token totals, and total
    chars per group. Map-side combine inside each batch (groups
    collapse to one row before any exchange) then a ``hash_aggregate``
    over the tiny (source, lang) key space — the same
    shuffle-lightness contract as ``vocab_topk``. Returns a Dataset of
    ``group_cols + [n_docs, n_tokens, n_chars]`` rows."""
    from centrality_gpu_ray.stages.shuffle import hash_aggregate

    group_cols = group_cols or ["source", "lang"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].fillna("")
        tok = text.str.split().str.len().to_numpy(np.int64)
        chars = text.str.len().to_numpy(np.int64)
        df = pd.DataFrame({c: batch[c] for c in group_cols})
        df["n_docs"] = np.ones(len(batch), dtype=np.int64)
        df["n_tokens"] = tok
        df["n_chars"] = chars
        # dropna=False: documents with a null source/lang must NOT
        # vanish from the composition report (sum(n_docs) would
        # undercount the corpus); the downstream hash_aggregate
        # hashes/groups null keys deterministically (pd.util.hash_array
        # maps None to a fixed value, pyarrow group_by keeps a null
        # group, sort_by orders nulls last).
        return df.groupby(group_cols, as_index=False, sort=True,
                          dropna=False).sum()

    partial.__name__ = "corpus_report_partial"
    partials = ds.select_columns(group_cols + [text_col]).map_batches(
        partial, batch_format="pandas", batch_size=4096)
    return hash_aggregate(
        partials, group_cols,
        [("n_docs", "sum"), ("n_tokens", "sum"), ("n_chars", "sum")],
        num_partitions=num_partitions)
