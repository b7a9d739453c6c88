"""Linear quality classifier over hashed n-gram features — the
fastText/CCNet-shape curation component (Joulin et al. 2016 "Bag of
Tricks for Efficient Text Classification"; Wenzek et al. 2020 "CCNet"
score web pages against a high-quality reference corpus with exactly
such a linear model; public methods, re-derived for the Ray engine).

Features are DSIR's hashed unigram+bigram buckets
(:mod:`~centrality_gpu_ray.functions.selection` — same sha256-prefix
hash family, so selection and classification agree on what a feature
is); a document's vector is its L1-normalized bucket-count histogram
plus a bias term.

Training is DETERMINISTIC full-batch logistic regression, not SGD:
every iteration computes the exact global gradient in one streaming
pass that emits ONE ``(B+2)``-float64 payload per block (gradient,
bias-gradient, log-loss) and folds them on the driver — the same
O(blocks·B) driver-state shape as ``dsir_fit``, order-free up to fp
association, no shuffle. Featurization (tokenize + sha256) happens
ONCE into a materialized ``list<int32>`` bucket-stream Dataset; the
iteration passes are pure numeric gathers over it.

100 TB shape: driver state is one B-vector per iteration fold; the
featurized corpus streams/spills in the object store; scoring is a
broadcast-weights ``map_batches`` identical to ``dsir_weights``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from centrality_gpu_ray.functions.selection import (_DEF_BUCKETS,
                                                    _gram_buckets)

__all__ = ["featurize_hashed_ngrams", "train_quality_classifier",
           "quality_scores", "quality_filter"]


def featurize_hashed_ngrams(ds, text_col: str = "text",
                            id_col: str = "doc_id",
                            label_col: str | None = None,
                            buckets: int = _DEF_BUCKETS):
    """One tokenize+hash pass → materialized ``(doc_id[, label],
    grams:list<int32>, n_grams:int64)`` Dataset (the bucket stream is
    per-doc-contiguous).  Training iterates over THIS, never re-hashing
    text."""
    cols = [id_col, text_col] + ([label_col] if label_col else [])

    def feat(t: pa.Table) -> pa.Table:
        txt = t.column(text_col).to_pandas().fillna("").tolist()
        b, n_grams = _gram_buckets(txt, buckets)
        off = np.zeros(len(txt) + 1, dtype=np.int64)
        np.cumsum(n_grams, out=off[1:])
        arr = pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32), type=pa.int32()),
            pa.array(b.astype(np.int32), type=pa.int32()))
        out = {id_col: t.column(id_col).cast(pa.int64()),
               "grams": arr,
               "n_grams": pa.array(n_grams.astype(np.int64))}
        if label_col:
            out[label_col] = t.column(label_col).cast(pa.int64())
        return pa.table(out)

    feat.__name__ = "featurize_hashed_ngrams"
    return ds.select_columns(cols).map_batches(
        feat, batch_format="pyarrow", batch_size=4096).materialize()


def _doc_margins(t: pa.Table, w: np.ndarray, bias: float) -> np.ndarray:
    """Per-doc margin ``w·x + bias`` for a featurized batch (x is the
    L1-normalized bucket histogram: gather + reduceat / n_grams)."""
    grams = t.column("grams")
    b = grams.combine_chunks().flatten().to_numpy(
        zero_copy_only=False).astype(np.int64)
    n = t.column("n_grams").to_numpy(zero_copy_only=False)
    z = np.full(t.num_rows, bias)
    nz = np.flatnonzero(n)
    if nz.size:
        seg = np.zeros(nz.size, dtype=np.int64)
        np.cumsum(n[nz][:-1], out=seg[1:])
        z[nz] += np.add.reduceat(w[b], seg) / n[nz]
    return z


def train_quality_classifier(ds, text_col: str = "text",
                             id_col: str = "doc_id",
                             label_col: str = "label",
                             buckets: int = _DEF_BUCKETS,
                             iters: int = 30, lr: float = 5.0,
                             l2: float = 1e-6,
                             features=None) -> dict:
    """Fit the logistic model → ``{"w", "bias", "buckets",
    "loss_curve", "n_docs"}``.  ``label_col`` must be 0/1.  Pass a
    pre-built ``features`` Dataset (from
    :func:`featurize_hashed_ngrams` WITH labels) to reuse one across
    runs."""
    import ray

    feats = features if features is not None else featurize_hashed_ngrams(
        ds, text_col=text_col, id_col=id_col, label_col=label_col,
        buckets=buckets)
    B = int(buckets)
    w = np.zeros(B)
    bias = 0.0
    n_docs = feats.count()
    if n_docs == 0:
        raise ValueError("train_quality_classifier: empty input")
    losses = []
    for _ in range(iters):
        ref = ray.put((w, bias))

        def grad_block(t: pa.Table, _ref=ref) -> pa.Table:
            ww, bb = ray.get(_ref)
            y = t.column(label_col).to_numpy(
                zero_copy_only=False).astype(np.float64)
            if not np.isfinite(y).all() or np.any((y != 0.0) & (y != 1.0)):
                # a single null/NaN label would NaN-poison the whole
                # model after one gradient fold, and quality_filter
                # would then silently drop every document — fail loudly
                raise ValueError(
                    "train_quality_classifier: labels must be 0/1 and "
                    "non-null")
            z = _doc_margins(t, ww, bb)
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y                         # d loss / d z
            g = np.zeros(B)
            n = t.column("n_grams").to_numpy(zero_copy_only=False)
            nz = np.flatnonzero(n)
            if nz.size:
                b = t.column("grams").combine_chunks().flatten() \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                np.add.at(g, b, np.repeat(r[nz] / n[nz], n[nz]))
            # stable logistic loss: log(1+e^z) - y·z
            loss = float(np.sum(np.logaddexp(0.0, z) - y * z))
            payload = np.concatenate(
                [g, [float(r.sum()), loss]])
            return pa.table({"p": pa.array([payload.tobytes()],
                                           type=pa.binary())})

        grad_block.__name__ = "logreg_grad_block"
        g = np.zeros(B + 2)
        for blk in feats.map_batches(
                grad_block, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"):
            for v in blk.column("p"):
                g += np.frombuffer(v.as_py(), dtype=np.float64)
        w -= lr * (g[:B] / n_docs + l2 * w)
        bias -= lr * g[B] / n_docs
        losses.append(g[B + 1] / n_docs)
    return {"w": w, "bias": float(bias), "buckets": B,
            "loss_curve": losses, "n_docs": int(n_docs)}


def quality_scores(ds, model: dict, text_col: str = "text",
                   id_col: str = "doc_id", features=None):
    """→ ``(doc_id, quality_prob)`` rows; broadcast weights, one
    gather+reduceat pass (over ``features`` if given, else raw text)."""
    import ray

    B = int(model["buckets"])
    ref = ray.put((np.asarray(model["w"]), float(model["bias"])))

    if features is not None:
        def score_f(t: pa.Table, _ref=ref) -> pa.Table:
            ww, bb = ray.get(_ref)
            z = _doc_margins(t, ww, bb)
            return pa.table({id_col: t.column(id_col).cast(pa.int64()),
                             "quality_prob":
                             pa.array(1.0 / (1.0 + np.exp(-z)))})

        return features.map_batches(score_f, batch_format="pyarrow")

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        ww, bb = ray.get(_ref)
        txt = t.column(text_col).to_pandas().fillna("").tolist()
        b, n = _gram_buckets(txt, B)
        z = np.full(len(txt), bb)
        nz = np.flatnonzero(n)
        if nz.size:
            seg = np.zeros(nz.size, dtype=np.int64)
            np.cumsum(n[nz][:-1], out=seg[1:])
            z[nz] += np.add.reduceat(ww[b], seg) / n[nz]
        return pa.table({id_col: t.column(id_col).cast(pa.int64()),
                         "quality_prob":
                         pa.array(1.0 / (1.0 + np.exp(-z)))})

    score.__name__ = "quality_scores"
    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", batch_size=4096)


def quality_filter(ds, model: dict, threshold: float = 0.5,
                   text_col: str = "text", id_col: str = "doc_id",
                   num_partitions: int = 32, features=None):
    """Keep the documents the model scores ≥ ``threshold`` — scores
    joined back to the full rows by a hash semi-join (the document
    payload never broadcasts).  Pass the pre-built ``features``
    Dataset to skip re-hashing the corpus."""
    from centrality_gpu_ray.stages.shuffle import hash_semi_join

    scores = quality_scores(ds, model, text_col=text_col, id_col=id_col,
                            features=features)

    def keep_ids(t: pa.Table) -> pa.Table:
        q = t.column("quality_prob").to_numpy()
        return t.filter(pa.array(q >= threshold)).select([id_col])

    keep_ids.__name__ = "quality_keepers"
    winners = scores.map_batches(keep_ids, batch_format="pyarrow")
    return hash_semi_join(ds, winners, on=id_col,
                          num_partitions=num_partitions)
