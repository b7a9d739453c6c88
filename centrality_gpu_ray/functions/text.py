"""Text analysis over the ``documents`` table — language-ID, quality
scoring, token counting, document fingerprinting.

These are the per-document operators a 100 TB training-data pipeline
runs at ingest, alongside the graph engine's sha256 stage. All are
actor-pool ``map_batches`` stages: regexes and frequency tables compile
once per actor in ``__init__`` (not per batch), bodies are vectorized
pandas/numpy. The reference engine has no string functions at all
(SURVEY.md §2.7) — this module is pure new-engine surface.
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


class TextAnalyzer:
    """Stateful text stage: compiled regexes + profiles live per actor."""

    def __init__(self):
        import re

        self.ws = re.compile(r"\s+")
        # BPE-ish word/number/punct splitter (GPT-2-style coarse classes)
        self.bpe = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
        self.word = re.compile(r"[a-zA-Z]{1,}")
        self.punct = re.compile(r"[.,;:!?]")
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

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
        toks = text.str.lower().str.findall(self.word)
        n_words = toks.str.len().clip(lower=1)
        stop_en = self.profiles["en"]
        stop_hits = toks.map(lambda ws: sum(w in stop_en for w in ws))
        n_chars = text.str.len().clip(lower=1)
        out = pd.DataFrame({"doc_id": batch["doc_id"]})
        out["len_score"] = np.clip(text.str.len() / 1000.0, 0.0, 1.0)
        out["punct_ratio"] = text.str.count(self.punct) / n_chars
        out["stopword_ratio"] = stop_hits / n_words
        out["mean_word_len"] = toks.map(lambda ws: float(np.mean([len(w) for w in ws]))
                                        if ws else 0.0)
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
        toks = batch["text"].fillna("").str.lower().str.findall(self.word)
        langs, scores = [], []
        for ws in toks:
            n = max(len(ws), 1)
            best_lang, best = "und", 0.0
            for lang in sorted(self.profiles):  # sorted → deterministic ties
                hits = sum(w in self.profiles[lang] for w in ws)
                score = hits / n
                if score > best:
                    best_lang, best = lang, score
            langs.append(best_lang if best >= 0.05 else "und")
            scores.append(round(best, 6))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "pred_lang": langs, "confidence": scores})

    # -- fingerprinting ---------------------------------------------------
    def fingerprint(self, batch: pd.DataFrame) -> pd.DataFrame:
        """64-bit rolling (polynomial) hash over whitespace tokens — a
        deterministic content fingerprint robust to whitespace jitter."""
        P = 1099511628211  # FNV prime
        M = (1 << 64) - 1
        fps = np.zeros(len(batch), dtype=np.uint64)
        for i, t in enumerate(batch["text"].fillna("")):
            toks = t.split()
            h = 1469598103934665603
            if toks:
                th = pd.util.hash_array(np.asarray(toks, dtype=object))
                for x in th:
                    h = ((h * P) & M) ^ int(x)
            fps[i] = np.uint64(h)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "fingerprint": fps.view(np.int64),
        })


def _stage(ds, method: str, concurrency: int = 2, batch_size: int = 2048):
    class _Runner(TextAnalyzer):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return getattr(self, method)(batch)

    _Runner.__name__ = f"TextAnalyzer.{method}"
    return ds.map_batches(_Runner, batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=0.5)


def token_stats(ds, **kw):
    return _stage(ds.select_columns(["doc_id", "text"]), "token_stats", **kw)


def quality_scores(ds, **kw):
    return _stage(ds.select_columns(["doc_id", "text"]), "quality", **kw)


def language_id(ds, **kw):
    return _stage(ds.select_columns(["doc_id", "text"]), "lang_id", **kw)


def fingerprints(ds, **kw):
    return _stage(ds.select_columns(["doc_id", "text"]), "fingerprint", **kw)
