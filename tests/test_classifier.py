"""Quality classifier (fastText/CCNet shape): deterministic full-batch
logistic regression over hashed n-gram features — serial-reference
parity, planted-separation behavior, filter semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.functions.classifier import (
    featurize_hashed_ngrams, quality_filter, quality_scores,
    train_quality_classifier)
from centrality_gpu_ray.functions.selection import _gram_buckets

B = 1024


def _planted(n=400, seed=3):
    """Half 'good' docs (common-English-ish vocab), half 'bad'
    (junk-token vocab), small shared vocab so it isn't trivially
    disjoint."""
    rng = np.random.default_rng(seed)
    good_v = np.array([f"word{i}" for i in range(40)])
    bad_v = np.array([f"zz{i}" for i in range(40)])
    shared = np.array(["the", "a", "of"])
    texts, labels = [], []
    for i in range(n):
        lab = i % 2
        base = good_v if lab else bad_v
        toks = rng.choice(base, size=12).tolist() + \
            rng.choice(shared, size=4).tolist()
        rng.shuffle(toks)
        texts.append(" ".join(toks))
        labels.append(lab)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "label": np.array(labels, dtype=np.int64)})


def _serial_train(df, buckets, iters, lr, l2):
    """From-scratch reference of the exact same full-batch GD."""
    b, n = _gram_buckets(df["text"].tolist(), buckets)
    off = np.zeros(len(df) + 1, dtype=np.int64)
    np.cumsum(n, out=off[1:])
    y = df["label"].to_numpy().astype(np.float64)
    w = np.zeros(buckets)
    bias = 0.0
    N = len(df)
    for _ in range(iters):
        z = np.full(N, bias)
        for i in range(N):
            if n[i]:
                z[i] += w[b[off[i]:off[i + 1]]].sum() / n[i]
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        g = np.zeros(buckets)
        for i in range(N):
            if n[i]:
                np.add.at(g, b[off[i]:off[i + 1]], r[i] / n[i])
        w -= lr * (g / N + l2 * w)
        bias -= lr * r.sum() / N
    return w, bias


def test_train_matches_serial_reference():
    df = _planted(n=120)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    model = train_quality_classifier(ds, buckets=B, iters=5, lr=2.0,
                                     l2=1e-4)
    w_ref, b_ref = _serial_train(df, B, iters=5, lr=2.0, l2=1e-4)
    np.testing.assert_allclose(model["w"], w_ref, rtol=1e-9, atol=1e-12)
    assert abs(model["bias"] - b_ref) < 1e-10
    # loss must decrease monotonically on this easy problem
    lc = model["loss_curve"]
    assert all(lc[i + 1] < lc[i] for i in range(len(lc) - 1))


def test_planted_separation_and_scoring():
    df = _planted(n=400)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    feats = featurize_hashed_ngrams(ds, label_col="label", buckets=B)
    model = train_quality_classifier(ds, buckets=B, features=feats)
    got = quality_scores(ds, model).to_pandas() \
        .merge(df[["doc_id", "label"]], on="doc_id")
    acc = ((got["quality_prob"] >= 0.5).astype(int)
           == got["label"]).mean()
    assert acc >= 0.99, acc
    # features-path scoring must agree exactly with the text path
    got_f = quality_scores(ds, model, features=feats).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got_t = got.sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_allclose(got_f["quality_prob"],
                               got_t["quality_prob"], rtol=1e-12)
    # held-out docs from the same distributions land on the right side
    hold = _planted(n=60, seed=99)
    hold["doc_id"] += 10_000
    hds = ray.data.from_arrow(pa.Table.from_pandas(hold))
    hsc = quality_scores(hds, model).to_pandas() \
        .merge(hold[["doc_id", "label"]], on="doc_id")
    hacc = ((hsc["quality_prob"] >= 0.5).astype(int)
            == hsc["label"]).mean()
    assert hacc >= 0.95, hacc


def test_quality_filter_matches_scores():
    df = _planted(n=200, seed=11)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    feats = featurize_hashed_ngrams(ds, label_col="label", buckets=B)
    model = train_quality_classifier(ds, buckets=B, iters=10)
    # text-path and features-path training are the same computation
    model_f = train_quality_classifier(ds, buckets=B, iters=10,
                                       features=feats)
    np.testing.assert_allclose(model_f["w"], model["w"], rtol=1e-12)
    sc = quality_scores(ds, model).to_pandas()
    want = set(sc.loc[sc["quality_prob"] >= 0.5, "doc_id"])
    kept = quality_filter(ds, model, threshold=0.5,
                          num_partitions=4).to_pandas()
    assert set(kept["doc_id"]) == want
    assert list(kept.columns) == ["doc_id", "text", "label"]  # schema kept
    # features passthrough must keep the same set without re-hashing
    kept_f = quality_filter(ds, model, threshold=0.5,
                            num_partitions=4, features=feats).to_pandas()
    assert set(kept_f["doc_id"]) == want


def test_null_label_raises_loudly():
    # a single null label must NOT silently NaN-poison the model
    df = _planted(n=20, seed=7)
    df["label"] = df["label"].astype(object)
    df.loc[3, "label"] = None
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(df["doc_id"]),
        "text": pa.array(df["text"]),
        "label": pa.array(df["label"].tolist(), type=pa.int64())}))
    with pytest.raises(Exception, match="0/1 and non-null"):
        train_quality_classifier(ds, buckets=B, iters=1)


def test_empty_input_raises():
    df = _planted(n=4)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).filter(
        lambda r: False)
    with pytest.raises(ValueError, match="empty"):
        train_quality_classifier(ds, buckets=B, iters=1)
