"""PII scrubbing and text normalization — per-batch vectorized string
rewrites a training-data pipeline runs before anything else touches the
corpus.

Design constraints (100 TB):

* pure map stages — no shuffle, no driver rows, stream-through;
* compiled-regex state cached once per worker process (same task-pool
  pattern as ``functions/text.py`` — an actor pool pays seconds of
  spawn for milliseconds of setup);
* every pattern is written in the common subset of Python ``re`` and
  RE2 (no lookarounds, no backreferences, explicit ``[ \\t\\r\\n..]``
  classes instead of ``\\s``) so the DuckDB ``regexp_replace`` oracle
  applies the *identical* semantics — the scrub is value-checked, not
  just row-counted;
* replacement order is fixed (EMAIL → IPV4 → PHONE) and audit counts
  are taken before rewriting, so the output is deterministic and the
  redaction volume is observable per shard.

The reference engine has no string surface (SURVEY.md §2.7); this is
new-engine training-data machinery.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Patterns deliberately in the re∩RE2 common subset. Greedy repetition
# has identical leftmost-match semantics in both engines for these.
PII_PATTERNS = [
    # (name, pattern, replacement)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
     "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
    ("phone", r"\+[0-9]{7,15}\b|\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b",
     "<PHONE>"),
]

_WS = r"[ \t\r\n\f\v]+"


class _Scrubber:
    """Compiled patterns, built once per worker process."""

    def __init__(self):
        import re

        # re.ASCII pins \b to the ASCII word boundary ([0-9A-Za-z_] on
        # one side) — exactly RE2's \b semantics. Without it Python's \b
        # is Unicode-aware, so a digit adjacent to a non-ASCII letter
        # (e.g. 'é192.168.0.1') is a boundary for the DuckDB oracle but
        # not for the engine, and the two diverge on non-ASCII corpora.
        self.pii = [(name, re.compile(pat, re.ASCII), repl)
                    for name, pat, repl in PII_PATTERNS]
        self.ws = re.compile(_WS)

    def scrub(self, batch: pd.DataFrame, text_col: str) -> pd.DataFrame:
        text = batch[text_col].fillna("")
        out = {"doc_id": batch["doc_id"].to_numpy()}
        for name, rx, repl in self.pii:
            out[f"n_{name}"] = text.str.count(rx).to_numpy(np.int64)
            text = text.str.replace(rx, repl, regex=True)
        out["text"] = text.to_numpy(dtype=object)
        return pd.DataFrame(out)

    def normalize(self, batch: pd.DataFrame, text_col: str,
                  lowercase: bool) -> pd.DataFrame:
        text = batch[text_col].fillna("").str.normalize("NFC")
        text = text.str.replace(self.ws, " ", regex=True).str.strip()
        if lowercase:
            text = text.str.lower()
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "text": text.to_numpy(dtype=object)})


_SCRUBBER: _Scrubber | None = None


def _scrubber() -> _Scrubber:
    global _SCRUBBER
    if _SCRUBBER is None:
        _SCRUBBER = _Scrubber()
    return _SCRUBBER


def scrub_pii(ds, text_col: str = "text", batch_size: int = 2048):
    """Redact emails / IPv4s / phone numbers; adds per-doc audit counts
    (``n_email``, ``n_ipv4``, ``n_phone``) taken pre-redaction."""
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return _scrubber().scrub(batch, text_col)

    fn.__name__ = "scrub_pii"
    return ds.select_columns(["doc_id", text_col]).map_batches(
        fn, batch_format="pandas", batch_size=batch_size)


def normalize_text(ds, text_col: str = "text", lowercase: bool = False,
                   batch_size: int = 2048):
    """NFC-normalize, collapse ASCII whitespace runs to single spaces,
    strip; optional lowercase. Matches the DuckDB oracle
    ``nfc_normalize(TRIM(regexp_replace(text, '[ \\t..]+', ' ', 'g')))``."""
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return _scrubber().normalize(batch, text_col, lowercase)

    fn.__name__ = "normalize_text"
    return ds.select_columns(["doc_id", text_col]).map_batches(
        fn, batch_format="pandas", batch_size=batch_size)


def scrub_oracle_sql(table_expr: str) -> str:
    """The DuckDB-equivalent scrub (same patterns, same order) for
    value-checking; ``table_expr`` is a table/read_parquet expression
    with doc_id + text."""
    sels = [
        f"CAST(LENGTH(regexp_extract_all(COALESCE(text,''), "
        f"'{PII_PATTERNS[0][1]}')) AS BIGINT) AS n_email"]
    inner = "COALESCE(text, '')"
    for name, pat, repl in PII_PATTERNS:
        if name != "email":
            sels.append(
                f"CAST(LENGTH(regexp_extract_all({inner}, '{pat}')) "
                f"AS BIGINT) AS n_{name}")
        inner = f"regexp_replace({inner}, '{pat}', '{repl}', 'g')"
    sels.append(f"{inner} AS text")
    return (f"SELECT doc_id, {', '.join(sels)} FROM {table_expr} "
            f"ORDER BY doc_id")
