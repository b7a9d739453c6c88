"""Benchmark-contamination detection — flag training documents that
share word n-grams with an evaluation/benchmark set.

The standard pre-training hygiene pass (GPT-3 appendix-C style): a
training doc is contaminated if any of its word ``n``-grams collides
with the benchmark set's n-grams. Two scale shapes:

* **Broadcast path** (the normal case): benchmark suites are tiny
  relative to a 100 TB corpus, so their union n-gram hash set is
  sorted, ``ray.put`` ONCE, and every ``map_batches`` task membership-
  tests its whole batch with one ``searchsorted`` + ``reduceat`` — no
  shuffle, one streaming pass over the corpus.
* **Distributed path** (``force_distributed`` or benchmark above
  ``max_broadcast`` hashes): both sides explode to (id, gram) rows and
  meet in a hash-partitioned semi-join keyed on the gram hash, then a
  per-doc count aggregate — never an all-pairs, never a driver
  materialization of the corpus side.

N-gram hashing reuses :func:`centrality_gpu_ray.functions.dedup.
_word_ngrams` (uint64 pandas hash of space-joined word windows) so
contamination and n-gram-Jaccard dedup agree on what an n-gram is.
The reference engine has no text surface at all (SURVEY.md §2.7);
this is new-engine training-data surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from centrality_gpu_ray.functions.dedup import _rows_gram_sets

_EMPTY = pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64()),
                    ("n_matched", pa.int64()), ("frac_matched", pa.float64())])


def benchmark_ngram_hashes(texts, n: int = 8) -> np.ndarray:
    """Union of word-n-gram hashes over the benchmark texts, sorted
    unique — the broadcast side."""
    _, hashes = _rows_gram_sets(list(texts), n)
    return np.unique(hashes)


def _batch_grams(batch: pd.DataFrame, n: int,
                 text_col: str, id_col: str):
    """(doc_ids, flat unique-per-doc gram hashes, grams per doc).

    Delegates to the jaccard family's fully-vectorized
    :func:`~centrality_gpu_ray.functions.dedup._rows_gram_sets`
    (one pandas explode + shift-windowed join + ONE ``hash_array``
    call per batch). The first version called the per-row kernel per
    doc — the per-CALL fixed cost of ``pd.util.hash_array`` made that
    19.5 s at 2M docs vs 1.18 s batched, identical output."""
    ids = batch[id_col].to_numpy()
    rows, hashes = _rows_gram_sets(batch[text_col].tolist(), n)
    sizes = np.bincount(rows, minlength=ids.size).astype(np.int64)
    return ids, hashes, sizes


def contamination_check(ds, benchmark_texts, n: int = 8,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_broadcast: int = 50_000_000,
                        force_distributed: bool = False,
                        num_partitions: int = 32):
    """Contaminated training docs → ``(doc_id, n_grams, n_matched,
    frac_matched)``, one row per doc with ≥1 benchmark n-gram hit.

    ``benchmark_texts``: iterable of benchmark strings (driver-side —
    benchmark suites are small; pass a Dataset via
    ``force_distributed`` semantics by exploding it yourself if not).
    """
    bench = benchmark_ngram_hashes(list(benchmark_texts), n)
    if not force_distributed and bench.size <= max_broadcast:
        return _contaminated_broadcast(ds, bench, n, text_col, id_col)
    return _contaminated_distributed(ds, bench, n, text_col, id_col,
                                     num_partitions)


def _contaminated_broadcast(ds, bench: np.ndarray, n: int,
                            text_col: str, id_col: str):
    import ray

    bench_ref = ray.put(bench)

    def fn(batch: pd.DataFrame, _ref=bench_ref) -> pa.Table:
        b = ray.get(_ref)
        ids, flat, sizes = _batch_grams(batch, n, text_col, id_col)
        if flat.size == 0 or b.size == 0:
            return _EMPTY.empty_table()
        idx = np.minimum(np.searchsorted(b, flat), b.size - 1)
        hit = (b[idx] == flat).astype(np.int64)
        # per-doc segment sums over the ragged flat array
        bounds = np.zeros(sizes.size + 1, dtype=np.int64)
        np.cumsum(sizes, out=bounds[1:])
        matched = np.add.reduceat(
            np.concatenate([hit, [0]]), bounds[:-1])
        matched[sizes == 0] = 0
        keep = matched > 0
        return pa.table({
            "doc_id": pa.array(ids[keep].astype(np.int64)),
            "n_grams": pa.array(sizes[keep]),
            "n_matched": pa.array(matched[keep]),
            "frac_matched": pa.array(matched[keep] / sizes[keep]),
        })

    fn.__name__ = "contamination_check"
    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas", batch_size=2048)


def _contaminated_distributed(ds, bench: np.ndarray, n: int,
                              text_col: str, id_col: str,
                              num_partitions: int):
    import ray.data

    from centrality_gpu_ray.stages.shuffle import (hash_aggregate,
                                                   hash_lookup_join,
                                                   hash_semi_join)

    def explode(batch: pd.DataFrame) -> pa.Table:
        ids, flat, sizes = _batch_grams(batch, n, text_col, id_col)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids.astype(np.int64), sizes)),
            "gram": pa.array(flat.astype(np.int64)),  # u64 bits as i64
        })

    grams = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pandas", batch_size=2048).materialize()
    bench_ds = ray.data.from_arrow(pa.table({
        "gram": pa.array(bench.astype(np.int64))}))
    matched = hash_semi_join(grams, bench_ds, on="gram",
                             num_partitions=num_partitions)
    n_matched = hash_aggregate(matched, ["doc_id"], [([], "count_all")],
                               num_partitions=num_partitions)
    totals = hash_aggregate(grams, ["doc_id"], [([], "count_all")],
                            num_partitions=num_partitions)

    def rename_m(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_id", "n_matched"])

    def rename_t(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_id", "n_grams"])

    joined = hash_lookup_join(
        n_matched.map_batches(rename_m, batch_format="pyarrow"),
        totals.map_batches(rename_t, batch_format="pyarrow"),
        row_key="doc_id", dict_key="doc_id",
        attach={"n_grams": "n_grams"},
        num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        m = t.column("n_matched").to_numpy().astype(np.int64)
        g = t.column("n_grams").to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_grams": pa.array(g),
            "n_matched": pa.array(m),
            "frac_matched": pa.array(m / np.maximum(g, 1)),
        })

    return joined.map_batches(finish, batch_format="pyarrow")
