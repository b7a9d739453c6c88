"""Text → graph bridge: token co-occurrence graph construction.

``cooccurrence_edges`` turns a documents table into a weighted
undirected edge list over token nodes: an edge (u, v, w) means tokens
u and v appeared within ``window`` positions of each other w times
across the corpus. ``cooccurrence_graph`` wraps it into a
:class:`Graph`, so every graph pipeline composes directly — PageRank
over it is TextRank keyword extraction, ``random_walks`` +
``skipgram_pairs`` over it is a word-embedding training corpus,
connected components are keyword clusters.

Conventions shared with the rest of the engine (value-exact in
DuckDB, see the pytest oracle in ``tests/test_textgraph.py``):

- tokenization = the ``vocab_topk`` / ``token_stats`` whitespace rule
  (strip, split on ``\\s+`` — ``functions/text.py::_vocab_partial``);
- node id = first 15 hex chars of ``sha256(token)`` as int64 (60 bits,
  always positive) — the ``doc_fingerprints`` hash family, SQL-side
  ``CAST(CAST('0x' || substr(sha256(tok),1,15) AS UBIGINT) AS BIGINT)``;
  only the per-batch VOCABULARY pays a Python hash call, the token
  stream stays vectorized (the per-row-hash lesson, CLAUDE.md r3);
- pairs are per-occurrence over positions (i < j, j − i ≤ window),
  canonicalized min/max, same-token pairs dropped.

Shape at scale: one streaming pass — each batch collapses its pair
multiset to distinct (src, dst, count) rows BEFORE the exchange
(map-side combine, the ``vocab_topk`` contract: the shuffle moves
vocabulary²-bounded rows, not corpus-sized ones), then ONE
``hash_aggregate`` keyed on the edge. ``token_vocab`` emits the
(node, token) dictionary the same way (distinct-before-shuffle).

The reference has no text→graph constructor — §2.9 beyond-reference
surface feeding the reference-shaped graph engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from centrality_gpu_ray.config import EngineConfig

__all__ = ["cooccurrence_edges", "cooccurrence_graph", "token_vocab"]

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                          ("weight", pa.int64())])
_VOCAB_SCHEMA = pa.schema([("node", pa.int64()), ("token", pa.string())])


def _token_ids(batch: pd.DataFrame):
    """Flatten a batch to (sha-id stream, per-value doc index, vocab).
    Vocabulary-level hashing: one sha256 per DISTINCT token."""
    import hashlib

    text = batch["text"].fillna("").str.strip()
    toks = text[text.str.len() > 0].str.split()
    flat = np.asarray([t for lst in toks for t in lst], dtype=object)
    if flat.size == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, object), np.empty(0, np.int64))
    sizes = np.fromiter((len(lst) for lst in toks), dtype=np.int64,
                        count=len(toks))
    lid = np.repeat(np.arange(sizes.size), sizes)
    uniq, inv = np.unique(flat, return_inverse=True)
    uh = np.fromiter(
        (int(hashlib.sha256(t.encode("utf-8")).hexdigest()[:15], 16)
         for t in uniq),
        dtype=np.int64, count=uniq.size)
    return uh[inv], lid, uniq, uh


def _pair_counts(ids: np.ndarray, lid: np.ndarray, window: int) -> pa.Table:
    """Distinct (src, dst, weight) of one batch's windowed pairs."""
    los, his = [], []
    for dist in range(1, window + 1):
        if ids.size <= dist:
            break
        a, b = ids[:-dist], ids[dist:]
        keep = (lid[:-dist] == lid[dist:]) & (a != b)
        los.append(np.minimum(a[keep], b[keep]))
        his.append(np.maximum(a[keep], b[keep]))
    if not los:
        return _EDGE_SCHEMA.empty_table()
    lo = np.concatenate(los)
    hi = np.concatenate(his)
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    new = np.empty(lo.size, dtype=bool)
    new[0] = True
    new[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, lo.size))
    return pa.table({"src": pa.array(lo[starts]),
                     "dst": pa.array(hi[starts]),
                     "weight": pa.array(cnt.astype(np.int64))})


def cooccurrence_edges(ds, window: int = 2, min_count: int = 1,
                       num_partitions: int = 32):
    """Weighted token co-occurrence edge Dataset
    ``(src, dst, weight)`` — src < dst, weight = total windowed
    co-occurrence count, edges with ``weight < min_count`` dropped."""
    from centrality_gpu_ray.stages.shuffle import hash_aggregate

    if window < 1:
        raise ValueError("window must be >= 1")

    def partial(batch: pd.DataFrame) -> pa.Table:
        ids, lid, _, _ = _token_ids(batch)
        return _pair_counts(ids, lid, window)

    partial.__name__ = "cooccurrence_partial"
    pre = ds.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=2048)
    agg = hash_aggregate(pre, ["src", "dst"], [("weight", "sum")],
                         num_partitions=num_partitions)
    if min_count > 1:
        import pyarrow.compute as pc

        agg = agg.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("weight"),
                                                min_count)),
            batch_format="pyarrow")
    return agg


def token_vocab(ds, num_partitions: int = 32):
    """(node, token) dictionary Dataset for interpreting co-occurrence
    graph results — distinct tokens with their sha-derived node ids."""
    from centrality_gpu_ray.stages.shuffle import hash_distinct

    def partial(batch: pd.DataFrame) -> pa.Table:
        _, _, uniq, uh = _token_ids(batch)
        return pa.table({"node": pa.array(uh.astype(np.int64)),
                         "token": pa.array(uniq, type=pa.string())})

    partial.__name__ = "vocab_partial"
    pre = ds.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=2048)
    return hash_distinct(pre, ["node", "token"],
                         num_partitions=num_partitions)


def cooccurrence_graph(ds, window: int = 2, min_count: int = 1,
                       config: EngineConfig | None = None,
                       mode: str = "auto"):
    """Build a :class:`Graph` over the co-occurrence edges (weights
    preserved — weighted PageRank over it is classic TextRank)."""
    from centrality_gpu_ray.pipelines.graph import Graph

    cfg = config or EngineConfig()
    edges = cooccurrence_edges(ds, window=window, min_count=min_count,
                               num_partitions=cfg.num_partitions)
    return Graph(edges, config=config, mode=mode)
