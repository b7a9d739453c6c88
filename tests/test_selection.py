"""DSIR importance weighting vs an independent from-scratch reference
(collections.Counter + hashlib, no shared code paths beyond the spec:
sha256-first-16-hex bucket hashing, unigram+bigram features, Laplace
multinomials)."""

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from centrality_gpu_ray.functions.selection import (dsir_fit, dsir_select,
                                                    dsir_weights)

B = 512  # small bucket count → deliberate collisions exercised


def _ref_bucket(g: str) -> int:
    return int(hashlib.sha256(g.encode("utf-8")).hexdigest()[:16], 16) % B


def _ref_grams(text: str) -> list:
    toks = text.split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _ref_counts(texts) -> np.ndarray:
    c = Counter()
    for t in texts:
        for g in _ref_grams(t or ""):
            c[_ref_bucket(g)] += 1
    out = np.zeros(B)
    for k, v in c.items():
        out[k] = v
    return out


def _ref_weights(raw_texts, target_texts, smoothing=1.0):
    tgt = _ref_counts(target_texts)
    raw = _ref_counts(raw_texts)
    log_t = np.log(tgt + smoothing) - np.log(tgt.sum() + smoothing * B)
    log_r = np.log(raw + smoothing) - np.log(raw.sum() + smoothing * B)
    r = log_t - log_r
    return [sum(r[_ref_bucket(g)] for g in _ref_grams(t or ""))
            for t in raw_texts]


def _corpus(seed=7, n=300):
    rng = np.random.default_rng(seed)
    sci = ["the experiment measured quantum decay rates precisely",
           "we prove the theorem by induction on graph size",
           "the model converges after twelve training epochs"]
    chat = ["lol that was so funny omg",
            "see you at the party tonight",
            "haha no way dude totally"]
    texts, kinds = [], []
    for i in range(n):
        base = sci if rng.random() < 0.3 else chat
        t = " ".join(rng.choice(base[rng.integers(0, 3)].split(),
                                rng.integers(4, 9)))
        texts.append(t)
        kinds.append("sci" if base is sci else "chat")
    return pd.DataFrame({"doc_id": np.arange(n), "text": texts,
                         "kind": kinds})


def test_dsir_weights_match_reference():
    import ray.data

    docs = _corpus()
    target = ["quantum theorem proof experiment model training",
              "graph induction decay rates converges epochs"]
    fit = dsir_fit(ray.data.from_pandas(docs), target, buckets=B)
    got = dsir_weights(ray.data.from_pandas(docs), fit).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _ref_weights(docs["text"].tolist(), target)
    np.testing.assert_allclose(got["dsir_logw"].to_numpy(),
                               np.asarray(want), rtol=1e-9, atol=1e-9)


def test_dsir_ranks_target_like_docs_higher():
    import ray.data

    docs = _corpus(seed=11)
    target = ["quantum theorem proof experiment model training epochs",
              "graph induction decay rates converges measured"]
    top = dsir_select(ray.data.from_pandas(docs), target, k=40,
                      buckets=B)
    kinds = docs.set_index("doc_id").loc[
        top.column("doc_id").to_numpy()]["kind"]
    # the selected docs are overwhelmingly the science-flavored ones
    assert (kinds == "sci").mean() > 0.9
    # descending weights, deterministic id tie-break
    w = top.column("dsir_logw").to_numpy()
    assert (np.diff(w) <= 1e-12).all()


def test_dsir_partitioning_invariance():
    import ray.data

    docs = _corpus(seed=3, n=120)
    target = ["quantum theorem proof"]
    one = dsir_select(ray.data.from_pandas(docs), target, k=15, buckets=B)
    many = dsir_select(ray.data.from_pandas(docs).repartition(7),
                       target, k=15, buckets=B)
    assert one.column("doc_id").to_pylist() == \
        many.column("doc_id").to_pylist()
    np.testing.assert_allclose(one.column("dsir_logw").to_numpy(),
                               many.column("dsir_logw").to_numpy(),
                               rtol=1e-9)


def test_dsir_empty_and_short_docs():
    import ray.data

    docs = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": ["", "single", None]})
    fit = dsir_fit(ray.data.from_pandas(docs), ["single token target"],
                   buckets=B)
    got = dsir_weights(ray.data.from_pandas(docs), fit).to_pandas() \
        .sort_values("doc_id")
    assert got["dsir_logw"].iloc[0] == 0.0      # empty doc: no grams
    assert got["dsir_logw"].iloc[2] == 0.0      # null doc
    want = _ref_weights(["", "single", ""], ["single token target"])
    np.testing.assert_allclose(got["dsir_logw"].to_numpy(), want,
                               rtol=1e-9, atol=1e-9)
