"""Hashed-LM perplexity vs an independent from-scratch reference
(collections.Counter + hashlib, no shared code paths beyond the spec:
sha256-first-16-hex bucket hashing, interpolated add-s bigram model,
nats-per-token perplexity)."""

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd

from centrality_gpu_ray.functions.lm import (lm_filter, lm_fit,
                                             lm_fit_texts, lm_perplexity)

BU = 256   # small bucket counts → deliberate collisions exercised
BB = 1024


def _bucket(g: str, m: int) -> int:
    return int(hashlib.sha256(g.encode("utf-8")).hexdigest()[:16], 16) % m


def _ref_fit(texts, s=0.5, lam=0.8):
    U, G = Counter(), Counter()
    for t in texts:
        toks = (t or "").split()
        for w in toks:
            U[_bucket(w, BU)] += 1
        for a, b in zip(toks, toks[1:]):
            G[_bucket(f"{a} {b}", BB)] += 1
    return U, G, s, lam


def _ref_score(text, model):
    U, G, s, lam = model
    toks = (text or "").split()
    if not toks:
        return 0, 0.0, float("nan")
    T = sum(U.values())
    den = T + s * BU
    lp = math.log((U[_bucket(toks[0], BU)] + s) / den)
    for a, b in zip(toks, toks[1:]):
        p_big = (G[_bucket(f"{a} {b}", BB)] + s) \
            / (U[_bucket(a, BU)] + s * BU)
        p_uni = (U[_bucket(b, BU)] + s) / den
        lp += math.log(lam * p_big + (1.0 - lam) * p_uni)
    return len(toks), lp, -lp / len(toks)


def _corpus(seed=11, n=240):
    rng = np.random.default_rng(seed)
    sci = ["the experiment measured quantum decay rates precisely",
           "we prove the theorem by induction on graph size",
           "the model converges after twelve training epochs"]
    chat = ["lol that was so funny omg",
            "see you at the party tonight",
            "haha no way dude totally"]
    texts, kinds = [], []
    for _ in range(n):
        base = sci if rng.random() < 0.4 else chat
        src = base[rng.integers(0, 3)].split()
        texts.append(" ".join(rng.choice(src, rng.integers(3, 9))))
        kinds.append("sci" if base is sci else "chat")
    texts[5] = ""          # empty doc → NaN perplexity
    texts[17] = "   "      # whitespace-only → zero tokens too
    return pd.DataFrame({"doc_id": np.arange(n), "text": texts,
                         "kind": kinds})


def _fit_target():
    return ["the experiment measured quantum decay rates precisely "
            "we prove the theorem by induction on graph size",
            "the model converges after twelve training epochs"]


def test_lm_scores_match_reference():
    import ray.data

    docs = _corpus()
    target = _fit_target()
    fit = lm_fit_texts(target, buckets_uni=BU, buckets_big=BB)
    got = lm_perplexity(ray.data.from_pandas(docs), fit).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ref_model = _ref_fit(target)
    want = [_ref_score(t, ref_model) for t in docs["text"]]
    np.testing.assert_array_equal(got["n_tokens"].to_numpy(),
                                  np.array([w[0] for w in want]))
    np.testing.assert_allclose(got["lm_logprob"].to_numpy(),
                               np.array([w[1] for w in want]),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(got["lm_log_ppl"].to_numpy(),
                               np.array([w[2] for w in want]),
                               rtol=1e-9, atol=1e-12, equal_nan=True)


def test_lm_fit_dataset_matches_texts_and_partitioning():
    import ray.data

    docs = _corpus(seed=3)
    ds1 = ray.data.from_pandas(docs).repartition(1)
    ds8 = ray.data.from_pandas(docs).repartition(8)
    f1 = lm_fit(ds1, buckets_uni=BU, buckets_big=BB)
    f8 = lm_fit(ds8, buckets_uni=BU, buckets_big=BB)
    ft = lm_fit_texts(docs["text"].tolist(), buckets_uni=BU,
                      buckets_big=BB)
    np.testing.assert_array_equal(f1["uni"], f8["uni"])
    np.testing.assert_array_equal(f1["big"], f8["big"])
    np.testing.assert_array_equal(f1["uni"], ft["uni"])
    np.testing.assert_array_equal(f1["big"], ft["big"])
    # scores are partitioning-invariant too
    s1 = lm_perplexity(ds1, f1).to_pandas().sort_values("doc_id")
    s8 = lm_perplexity(ds8, f8).to_pandas().sort_values("doc_id")
    np.testing.assert_allclose(s1["lm_log_ppl"].to_numpy(),
                               s8["lm_log_ppl"].to_numpy(),
                               rtol=0, atol=0, equal_nan=True)


def test_lm_in_domain_scores_lower():
    import ray.data

    docs = _corpus(seed=29)
    fit = lm_fit_texts(_fit_target(), buckets_uni=BU, buckets_big=BB)
    got = lm_perplexity(ray.data.from_pandas(docs), fit).to_pandas()
    merged = got.merge(docs[["doc_id", "kind"]], on="doc_id")
    merged = merged[merged["n_tokens"] > 0]
    sci = merged.loc[merged["kind"] == "sci", "lm_log_ppl"].mean()
    chat = merged.loc[merged["kind"] == "chat", "lm_log_ppl"].mean()
    assert sci < chat, (sci, chat)


def test_lm_filter_matches_threshold_and_keeps_columns():
    import ray.data

    docs = _corpus(seed=41)
    fit = lm_fit_texts(_fit_target(), buckets_uni=BU, buckets_big=BB)
    scores = lm_perplexity(ray.data.from_pandas(docs), fit).to_pandas()
    thr = float(np.nanmedian(scores["lm_log_ppl"]))
    kept = lm_filter(ray.data.from_pandas(docs), fit, thr).to_pandas()
    want_ids = set(scores.loc[scores["lm_log_ppl"] <= thr, "doc_id"])
    assert set(kept["doc_id"]) == want_ids
    assert 0 < len(kept) < len(docs)
    # empty docs (NaN) never pass
    assert 5 not in set(kept["doc_id"]) and 17 not in set(kept["doc_id"])
    # original columns ride through, score attached
    assert {"doc_id", "text", "kind", "lm_log_ppl"} <= set(kept.columns)
    m = kept.merge(scores, on="doc_id")
    np.testing.assert_allclose(m["lm_log_ppl_x"], m["lm_log_ppl_y"],
                               rtol=0, atol=0)


def test_lm_empty_dataset_and_validation():
    import pytest
    import ray.data

    empty = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                      "text": pd.Series([], dtype=object)}))
    fit = lm_fit_texts(["a b c"], buckets_uni=BU, buckets_big=BB)
    assert lm_perplexity(empty, fit).count() == 0
    with pytest.raises(ValueError):
        lm_fit_texts(["x"], smoothing=0.0)
    with pytest.raises(ValueError):
        lm_fit_texts(["x"], lam=1.5)


def test_lm_filter_refilter_no_duplicate_column():
    """Filtering already-scored output must replace lm_log_ppl, not
    append a second column of the same name."""
    import pyarrow as pa
    import ray.data

    docs = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array(["the cat sat on the mat"] * 3 +
                         ["zq xv jk wq pl mn"] * 3)})
    ds = ray.data.from_arrow(docs)
    fit = lm_fit(ds, text_col="text")
    twice = lm_filter(lm_filter(ds, fit, max_log_ppl=1e9),
                      fit, max_log_ppl=1e9)
    names = twice.schema().names
    assert names.count("lm_log_ppl") == 1
    assert twice.count() == 6
