"""Repetition-based quality statistics over the ``documents`` table —
the Gopher-style (Rae et al. 2021, §A1.1) duplicate-text signals a
pretraining pipeline filters on, which ``functions/text.py``'s
length/punctuation quality score does not capture.

Per-document metrics (exact definitions, mirrored by the DuckDB oracle
in ``tests/test_repetition.py``):

* ``n_lines`` — non-empty lines after stripping ASCII space/tab/CR
  (split on ``\\n``).
* ``dup_line_frac`` — ``(n_lines - distinct_lines) / n_lines``
  (0 when the doc has no lines).
* ``dup_line_char_frac`` — characters in duplicate line INSTANCES
  beyond each line's first occurrence, over all line characters:
  ``sum((cnt-1)*len) / sum(cnt*len)``.
* ``top2gram_char_frac`` — for adjacent word pairs (whitespace
  tokenization): ``max_count * max_len_among_tied / len(' '.join(
  words))`` where ``max_len_among_tied`` is the longest "w1 w2"
  string among pairs achieving the maximal count — choosing the
  LONGEST tied pair makes the metric value deterministic without a
  lexicographic tie-break (tied pairs of equal length give the same
  value by construction). 0 when the doc has < 2 words.  Because
  occurrences of a pair can OVERLAP on a shared word ("spam spam
  spam" counts "spam spam" twice), this count·len form can exceed 1 —
  it is an upper bound on the covered-character fraction, monotone in
  repetition, which is what a threshold filter needs.

Everything is one ``pd.util.hash_array`` call per batch (per-CALL
fixed cost — the 16× lesson from ``contamination.py``) plus lexsort
run-length counting; no per-row Python in the hot path.  Duplicate
detection is hash-based (64-bit): two DISTINCT lines/grams colliding
within one document would miscount — probability ~1e-13 at 10^3
lines/doc, accepted and documented (the DuckDB oracle groups by the
actual strings, so the pytest gate would catch a collision in test
data).

The reference engine has no string surface at all (SURVEY.md §2.7) —
pure new-engine training-data capability, same task-pool shape as
``functions/text.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_STRIP = " \t\r"


def _mix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """splitmix64-style combine of two uint64 hash arrays."""
    z = (a ^ (b + np.uint64(0x9E3779B97F4A7C15)
              + (a << np.uint64(6)) + (a >> np.uint64(2))))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _run_counts(doc: np.ndarray, key: np.ndarray):
    """Sorted-run decomposition of (doc, key) pairs → per-run
    ``(order, run_id, run_count)`` (order sorts the inputs)."""
    order = np.lexsort((key, doc))
    ds_, ks_ = doc[order], key[order]
    new = np.r_[True, (ds_[1:] != ds_[:-1]) | (ks_[1:] != ks_[:-1])]
    rid = np.cumsum(new) - 1
    cnt = np.bincount(rid)
    return order, rid, cnt, ds_[new]


def _repetition_batch(batch: pd.DataFrame) -> pd.DataFrame:
    text = batch["text"].fillna("").astype(str)
    n = len(batch)
    out = {
        "doc_id": batch["doc_id"].to_numpy(),
        "n_lines": np.zeros(n, dtype=np.int64),
        "dup_line_frac": np.zeros(n),
        "dup_line_char_frac": np.zeros(n),
        "top2gram_char_frac": np.zeros(n),
    }
    if n == 0:
        return pd.DataFrame(out)

    # ---- lines ----
    lines = text.str.split("\n")
    sizes = lines.str.len().to_numpy(np.int64)
    doc_l = np.repeat(np.arange(n, dtype=np.int64), sizes)
    flat = np.asarray([ln for ls in lines for ln in ls], dtype=object)
    if flat.size:
        stripped = pd.Series(flat, dtype=object).str.strip(_STRIP)
        slen = stripped.str.len().to_numpy(np.int64)
        keep = slen > 0
        doc_l = doc_l[keep]
        sl = stripped.to_numpy(object)[keep]
        # reuse the pandas lengths: sl.astype(str) would allocate a
        # fixed-width U array sized n_strings × 4 × LONGEST string —
        # one 500 KB line in a batch transiently costs GBs
        lens = slen[keep]
        if sl.size:
            h = pd.util.hash_array(sl)
            order, rid, cnt, _ = _run_counts(doc_l, h)
            lens_s = lens[order]
            run_len = np.bincount(rid, weights=lens_s)  # Σ len per run
            # all instances of one run share a length (same string)
            first = np.r_[True, rid[1:] != rid[:-1]]
            one_len = lens_s[first].astype(np.float64)
            nl = np.bincount(doc_l, minlength=n).astype(np.float64)
            distinct = np.bincount(doc_l[order][first], minlength=n) \
                .astype(np.float64)
            dup_chars = np.zeros(n)
            all_chars = np.zeros(n)
            rd = doc_l[order][first]
            np.add.at(dup_chars, rd, (cnt - 1) * one_len)
            np.add.at(all_chars, rd, run_len)
            has = nl > 0
            out["n_lines"] = nl.astype(np.int64)
            out["dup_line_frac"][has] = (nl[has] - distinct[has]) / nl[has]
            hc = all_chars > 0
            out["dup_line_char_frac"][hc] = dup_chars[hc] / all_chars[hc]

    # ---- word 2-grams ----
    words = text.str.split()
    wsz = words.str.len().fillna(0).to_numpy(np.int64)
    doc_w = np.repeat(np.arange(n, dtype=np.int64), wsz)
    wflat = np.asarray([w for ws in words if isinstance(ws, list)
                        for w in ws], dtype=object)
    if wflat.size:
        wh = pd.util.hash_array(wflat)
        wlen = pd.Series(wflat, dtype=object).str.len() \
            .to_numpy(np.int64)  # no fixed-width U-dtype conversion
        # adjacent pairs within each doc: positions i, i+1 same doc
        adj = np.flatnonzero((doc_w[1:] == doc_w[:-1]))
        if adj.size:
            gdoc = doc_w[adj]
            gkey = _mix(wh[adj], wh[adj + 1])
            glen = wlen[adj] + wlen[adj + 1] + 1
            order, rid, cnt, rdoc = _run_counts(gdoc, gkey)
            first = np.r_[True, rid[1:] != rid[:-1]]
            run_len = glen[order][first].astype(np.int64)
            # per-doc max count, then max gram length among tied runs
            mc = np.zeros(n, dtype=np.int64)
            np.maximum.at(mc, rdoc, cnt)
            tied = cnt == mc[rdoc]
            ml = np.zeros(n, dtype=np.int64)
            np.maximum.at(ml, rdoc[tied], run_len[tied])
            # join length = Σ word lens + (n_words - 1)
            jl = np.zeros(n, dtype=np.int64)
            np.add.at(jl, doc_w, wlen)
            jl = jl + np.maximum(wsz - 1, 0)
            hg = (wsz >= 2) & (jl > 0)
            out["top2gram_char_frac"][hg] = (
                mc[hg].astype(np.float64) * ml[hg] / jl[hg])
    return pd.DataFrame(out)


def repetition_stats(ds, batch_size: int = 2048):
    """``(doc_id, text)`` → per-doc repetition metrics (schema above)."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        _repetition_batch, batch_format="pandas", batch_size=batch_size)


def repetition_filter(ds, max_dup_line_frac: float = 0.3,
                      max_dup_line_char_frac: float = 0.2,
                      max_top2gram_char_frac: float = 0.2,
                      batch_size: int = 2048):
    """Drop documents exceeding any repetition threshold (the Gopher
    rule shape).  Stateless per-batch predicate — partitioning- and
    resume-invariant, no shuffle."""

    def _filt(batch: pd.DataFrame) -> pd.DataFrame:
        stats = _repetition_batch(batch)
        keep = ((stats["dup_line_frac"] <= max_dup_line_frac)
                & (stats["dup_line_char_frac"] <= max_dup_line_char_frac)
                & (stats["top2gram_char_frac"]
                   <= max_top2gram_char_frac)).to_numpy()
        return batch.iloc[np.flatnonzero(keep)]

    return ds.map_batches(_filt, batch_format="pandas",
                          batch_size=batch_size)
