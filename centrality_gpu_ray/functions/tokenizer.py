"""Distributed BPE tokenizer training and encoding.

The scalable shape — the one HuggingFace tokenizers / SentencePiece
actually use on large corpora — is NOT "iterate merges over the
corpus": the corpus pass is ONE distributed word-frequency count
(map-side combine → token-keyed hash exchange → exact top-W words,
reusing :func:`centrality_gpu_ray.functions.text.vocab_topk`); merge
training then runs over the WORD-FREQUENCY table, which is
vocabulary-sized (Zipf-capped at ``max_words``), never touching the
corpus again. Encoding back over the corpus is a stateless broadcast
``map_batches`` with a per-process word→pieces memo — by Zipf's law
the memo hit rate equals the unigram mass of the cached words, so the
per-doc cost collapses to a dict lookup per word.

Word model: whitespace tokens (the same rule as ``token_stats`` /
``vocab_topk`` and their DuckDB oracles), Sennrich et al. (2016)
style — a word's initial symbols are its characters with ``"</w>"``
appended to the last one, so token streams are reversible
(``"".join(pieces) == word + "</w>"``).

Determinism: merges tie-break on (count desc, pair lexicographic asc),
and the corpus pass is the exact top-W count — training is a pure
function of the corpus multiset, invariant to partitioning.
"""
from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

__all__ = ["bpe_train", "bpe_encode", "bpe_token_count",
           "encode_word"]

_EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence: characters, EOW glued to the last.
    Total: the empty word maps to the bare EOW marker, preserving
    ``"".join(syms) == word + "</w>"``."""
    if len(word) <= 1:
        return (word + _EOW,)
    return tuple(word[:-1]) + (word[-1] + _EOW,)


# ---------------------------------------------------------------------------
# training — driver-side over the (word, count) table
# ---------------------------------------------------------------------------

def _pair_stats(words: list[tuple[str, ...]], counts: np.ndarray):
    """Full pair statistics + inverted index pair → {word_i: n_occ}."""
    stats: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], dict[int, int]] = {}
    for i, (syms, c) in enumerate(zip(words, counts)):
        c = int(c)
        for a, b in zip(syms[:-1], syms[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + c
            occ = where.setdefault((a, b), {})
            occ[i] = occ.get(i, 0) + 1
    return stats, where


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str],
                merged: str) -> tuple[str, ...]:
    out, i, n = [], 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(ds=None, num_merges: int = 1000,
              max_words: int = 100_000, num_partitions: int = 32,
              word_counts: "pa.Table | None" = None) -> dict:
    """Train a BPE merge table. ``ds`` is a documents Dataset with a
    ``text`` column; the corpus is touched exactly once (the
    distributed exact top-``max_words`` word count). Alternatively
    pass a precomputed ``word_counts`` table (columns ``token``,
    ``count``) — e.g. one ``vocab_topk`` output shared across
    tokenizer sweeps.

    Driver-side training is the classic incremental algorithm over
    the (word, count) table: maintain pair counts plus an inverted
    pair→words index, merge the argmax pair, update only the words
    that contained it — O(changed words) per merge, bounded by the
    ``max_words`` cap (≤1e5 rows — vocabulary-sized, NEVER
    corpus-sized; the Zipf tail that falls off the cap only loses
    counts for merges it couldn't have won).

    Returns ``{"merges": [(a, b), ...], "vocab": {piece: rank}}``
    where vocab covers initial characters + merge outputs.
    """
    if word_counts is None:
        if ds is None:
            raise ValueError("pass a Dataset or a word_counts table")
        from centrality_gpu_ray.functions.text import vocab_topk

        word_counts = vocab_topk(ds, k=max_words,
                                 num_partitions=num_partitions)
    toks = word_counts.column("token").to_pylist()
    counts = np.asarray(word_counts.column("count").to_numpy(),
                        dtype=np.int64)
    # user-supplied tables may carry zero/negative-count rows (e.g. a
    # filtered join); they contribute nothing and would corrupt the
    # delete-on-zero pair bookkeeping — drop them up front
    keep = counts >= 1
    if not keep.all():
        toks = [t for t, k in zip(toks, keep) if k]
        counts = counts[keep]

    words = [_word_symbols(w) for w in toks]
    stats, where = _pair_stats(words, counts)
    merges: list[tuple[str, str]] = []
    chars = sorted({s for syms in words for s in syms})

    # lazy max-heap over (-count, pair): entries go stale when a pair's
    # count changes; pop-time validation against `stats` (the source of
    # truth) discards them. Heap order (-count, pair lex asc) is exactly
    # the deterministic tie-break, and argmax becomes O(log |pairs|)
    # amortized instead of a full O(|pairs|) scan per merge.
    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in stats.items()]
    heapq.heapify(heap)

    for _ in range(num_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if stats.get(p) == -negc:  # current ⇔ valid, stale ⇔ skip
                best = p
                break
        if best is None or -negc < 1:
            break
        merged = best[0] + best[1]
        merges.append(best)
        touched: set[tuple[str, str]] = set()
        for i in list(where.get(best, ())):
            old = words[i]
            new = _merge_word(old, best, merged)
            c = int(counts[i])
            # decrement the old word's pair multiset, increment the new
            for a, b in zip(old[:-1], old[1:]):
                stats[(a, b)] -= c
                occ = where[(a, b)]
                occ[i] -= 1
                if occ[i] == 0:
                    del occ[i]
                if stats[(a, b)] == 0:
                    del stats[(a, b)], where[(a, b)]
                else:
                    touched.add((a, b))
            for a, b in zip(new[:-1], new[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + c
                occ = where.setdefault((a, b), {})
                occ[i] = occ.get(i, 0) + 1
                touched.add((a, b))
            words[i] = new
        for p in touched:
            if p in stats:
                heapq.heappush(heap, (-stats[p], p))

    vocab = {p: r for r, p in enumerate(
        chars + [a + b for a, b in merges])}
    return {"merges": merges, "vocab": vocab}


# ---------------------------------------------------------------------------
# encoding — broadcast map over the corpus
# ---------------------------------------------------------------------------

def encode_word(word: str, ranks: dict[tuple[str, str], int]
                ) -> tuple[str, ...]:
    """Apply merges to one word by rank order (the standard greedy
    lowest-rank-first loop). Pure; memoized by the batch fns."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


_MEMO_CAP = 1 << 17  # total entries across ALL tokenizers in a process
_MEMO: dict[int, dict] = {}


def _proc_memo(ranks_key: int) -> dict:
    # per-process, per-tokenizer memo: Zipf makes the hit rate the
    # unigram mass of the cached words. One sub-dict per tokenizer key
    # under a SHARED total cap — two pipelines with different merge
    # tables interleaving batches on one worker must not evict each
    # other's memo (clearing on key change thrashed the cache to ~0%).
    memo = _MEMO.get(ranks_key)
    if memo is None:
        memo = _MEMO[ranks_key] = {}
    return memo


def _encode_batch(batch, ranks: dict, ranks_key: int,
                  text_col: str, emit_tokens: bool):
    memo = _proc_memo(ranks_key)
    budget = _MEMO_CAP - sum(map(len, _MEMO.values()))
    texts = batch[text_col].fillna("")
    n_tok, toks_out = [], []
    for t in texts:
        pieces: list[str] = []
        for w in t.split():
            got = memo.get(w)
            if got is None:
                got = encode_word(w, ranks)
                if budget > 0:
                    memo[w] = got
                    budget -= 1
            pieces.extend(got)
        n_tok.append(len(pieces))
        if emit_tokens:
            toks_out.append(pieces)
    cols = {"doc_id": pa.array(batch["doc_id"].to_numpy()
                               .astype(np.int64)),
            "n_bpe_tokens": pa.array(
                np.asarray(n_tok, dtype=np.int64))}
    if emit_tokens:
        cols["bpe_tokens"] = pa.array(
            toks_out, type=pa.list_(pa.string()))
    return pa.table(cols)


def _ranks_of(tokenizer: dict) -> tuple[dict, int]:
    merges = [tuple(m) for m in tokenizer["merges"]]
    ranks = {m: r for r, m in enumerate(merges)}
    import hashlib

    key = int.from_bytes(hashlib.sha256(
        "\x1f".join(a + "\x1e" + b for a, b in merges).encode()
    ).digest()[:8], "big")
    return ranks, key


def bpe_encode(ds, tokenizer: dict, text_col: str = "text"):
    """Encode every document → ``(doc_id, n_bpe_tokens, bpe_tokens)``
    with ``bpe_tokens`` a ``list<string>`` column. Stateless broadcast
    map (the merge table rides the serialized closure once per task,
    not per batch); heavyweight output — prefer
    :func:`bpe_token_count` when only lengths are needed."""
    ranks, key = _ranks_of(tokenizer)

    def fn(batch):
        return _encode_batch(batch, ranks, key, text_col, True)

    fn.__name__ = "bpe_encode"
    return ds.map_batches(fn, batch_format="pandas", batch_size=1024)


def bpe_token_count(ds, tokenizer: dict, text_col: str = "text"):
    """Per-document trained-tokenizer token counts →
    ``(doc_id, n_bpe_tokens)`` — the length statistic sequence packing
    and mixture weighting actually need."""
    ranks, key = _ranks_of(tokenizer)

    def fn(batch):
        return _encode_batch(batch, ranks, key, text_col, False)

    fn.__name__ = "bpe_token_count"
    return ds.map_batches(fn, batch_format="pandas", batch_size=1024)
