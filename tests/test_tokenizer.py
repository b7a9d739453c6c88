"""BPE tokenizer: training parity vs a naive reference, encode
reversibility, memo correctness, partitioning invariance."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.functions.tokenizer import (
    _word_symbols, bpe_encode, bpe_token_count, bpe_train, encode_word)


def _naive_train(word_counts: dict[str, int], num_merges: int):
    """Reference trainer: recompute FULL pair stats every merge —
    independently checks the incremental-update bookkeeping."""
    words = {w: list(_word_symbols(w)) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        stats = {}
        for w, syms in words.items():
            c = word_counts[w]
            for p in zip(syms[:-1], syms[1:]):
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _counts_table(wc: dict[str, int]) -> pa.Table:
    toks = sorted(wc, key=lambda w: (-wc[w], w))
    return pa.table({"token": pa.array(toks, type=pa.string()),
                     "count": pa.array([wc[t] for t in toks],
                                       type=pa.int64())})


def test_train_matches_naive_reference():
    rng = np.random.default_rng(3)
    vocab = ["low", "lower", "lowest", "newer", "wider", "new",
             "apple", "apples", "applesauce", "banana", "bananas",
             "sandbank", "sandstone", "standalone", "stone", "band"]
    wc = {w: int(rng.integers(1, 200)) for w in vocab}
    want = _naive_train(dict(wc), 40)
    got = bpe_train(word_counts=_counts_table(wc), num_merges=40)
    assert got["merges"] == want
    # vocab covers every initial char-symbol and every merge output
    for a, b in want:
        assert a + b in got["vocab"]
    assert "l" in got["vocab"] and "w</w>" in got["vocab"]


def test_train_overlapping_pair_runs():
    # 'aaaa' stresses non-overlapping merge semantics: (a,a) merges
    # left-to-right, aaaa -> (aa)(aa), not (a)(aa)(a)
    wc = {"aaaa": 10, "aaa": 7, "aa": 5}
    want = _naive_train(dict(wc), 10)
    got = bpe_train(word_counts=_counts_table(wc), num_merges=10)
    assert got["merges"] == want


def test_encode_reversible_and_respects_ranks():
    wc = {"hugging": 10, "hugs": 8, "hug": 12, "jug": 6, "rug": 4}
    tok = bpe_train(word_counts=_counts_table(wc), num_merges=20)
    ranks = {tuple(m): r for r, m in enumerate(tok["merges"])}
    for w in list(wc) + ["unseen", "hugjugrug", "x"]:
        pieces = encode_word(w, ranks)
        assert "".join(pieces) == w + "</w>"
    # a fully-merged training word encodes to one piece
    assert encode_word("hug", ranks) == ("hug</w>",)


def test_encode_dataset_counts_and_tokens():
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["hug hug hugs", "the hug", "", "jug  rug\njug"]})
    ds = ray.data.from_pandas(docs).repartition(2)
    tok = bpe_train(ds, num_merges=30, max_words=100)
    ranks = {tuple(m): r for r, m in enumerate(tok["merges"])}

    got = bpe_encode(ds, tok).to_pandas().sort_values("doc_id")
    for _, row in got.iterrows():
        words = docs.loc[docs.doc_id == row.doc_id, "text"].iloc[0].split()
        want = [p for w in words for p in encode_word(w, ranks)]
        assert list(row.bpe_tokens) == want
        assert row.n_bpe_tokens == len(want)

    cnt = bpe_token_count(ds, tok).to_pandas().sort_values("doc_id")
    assert cnt["n_bpe_tokens"].tolist() == got["n_bpe_tokens"].tolist()
    assert "bpe_tokens" not in cnt.columns


def test_train_partitioning_invariant_over_corpus():
    rng = np.random.default_rng(9)
    base = ["red", "green", "blue", "greenish", "reddish", "bluer"]
    texts = [" ".join(rng.choice(base, size=rng.integers(3, 9)))
             for _ in range(60)]
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": texts})
    toks = []
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        toks.append(bpe_train(ds, num_merges=25, max_words=1000))
    assert toks[0]["merges"] == toks[1]["merges"]
    assert toks[0]["vocab"] == toks[1]["vocab"]


def test_memo_does_not_leak_across_tokenizers():
    # same word, two different merge tables -> different encodings;
    # the process-level memo must key on the tokenizer
    wc_a = {"ab": 100, "abc": 1}
    wc_b = {"bc": 100, "abc": 1}
    tok_a = bpe_train(word_counts=_counts_table(wc_a), num_merges=2)
    tok_b = bpe_train(word_counts=_counts_table(wc_b), num_merges=2)
    df = pd.DataFrame({"doc_id": np.array([0], dtype=np.int64),
                       "text": ["abc"]})
    ds = ray.data.from_pandas(df)
    got_a = bpe_encode(ds, tok_a).to_pandas()["bpe_tokens"].iloc[0]
    got_b = bpe_encode(ds, tok_b).to_pandas()["bpe_tokens"].iloc[0]
    ranks_a = {tuple(m): r for r, m in enumerate(tok_a["merges"])}
    ranks_b = {tuple(m): r for r, m in enumerate(tok_b["merges"])}
    assert list(got_a) == list(encode_word("abc", ranks_a))
    assert list(got_b) == list(encode_word("abc", ranks_b))
    assert list(got_a) != list(got_b)


def test_train_input_validation():
    with pytest.raises(ValueError, match="Dataset or a word_counts"):
        bpe_train(num_merges=5)


def test_train_ignores_nonpositive_count_rows():
    # a zero-count row sharing a pair with a live word used to KeyError
    # inside the delete-on-zero bookkeeping
    wc_live = {"ab": 5, "cab": 3}
    t = pa.table({"token": pa.array(["ab", "zab", "cab", "qq"]),
                  "count": pa.array([5, 0, 3, -2], type=pa.int64())})
    got = bpe_train(word_counts=t, num_merges=10)
    want = bpe_train(word_counts=_counts_table(wc_live), num_merges=10)
    assert got["merges"] == want["merges"]


def test_empty_word_is_total():
    assert _word_symbols("") == ("</w>",)
    assert encode_word("", {}) == ("</w>",)
    t = pa.table({"token": pa.array(["", "ab"]),
                  "count": pa.array([4, 2], type=pa.int64())})
    got = bpe_train(word_counts=t, num_merges=5)  # must not crash
    assert ("a", "b</w>") in [tuple(m) for m in got["merges"]]


def test_heap_trainer_matches_naive_randomized():
    # the lazy-heap argmax must reproduce the full-scan argmax exactly,
    # including (count desc, pair lex asc) tie-breaks, on random corpora
    rng = np.random.default_rng(17)
    alphabet = list("abcd")
    for trial in range(20):
        n_words = int(rng.integers(3, 25))
        wc = {}
        for _ in range(n_words):
            w = "".join(rng.choice(alphabet,
                                   size=int(rng.integers(1, 7))))
            wc[w] = int(rng.integers(1, 50))
        want = _naive_train(dict(wc), 30)
        got = bpe_train(word_counts=_counts_table(wc), num_merges=30)
        assert got["merges"] == want, (trial, wc)
