"""Benchmark-contamination detection vs an independent Python-set
oracle; broadcast and distributed paths must agree exactly."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from centrality_gpu_ray.functions.contamination import (
    benchmark_ngram_hashes, contamination_check)
from centrality_gpu_ray.functions.dedup import _word_ngrams

SF = "/root/testdata/sf0.001"
N = 4  # short n so the tiny corpus actually collides


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])


def _bench_texts():
    # take a few real docs as the "benchmark" → guaranteed overlap,
    # plus one novel string that must match nothing
    df = _docs().to_pandas().sort_values("doc_id")
    return (df["text"].iloc[:5].fillna("").tolist()
            + ["zz unique benchmark sentence xx yy"])


def _oracle(df, bench_texts):
    bench = set()
    for t in bench_texts:
        bench.update(_word_ngrams(t or "", N).tolist())
    rows = {}
    for i, t in zip(df["doc_id"], df["text"].fillna("")):
        grams = set(_word_ngrams(t or "", N).tolist())
        m = len(grams & bench)
        if m:
            rows[int(i)] = (len(grams), m)
    return rows


def test_contamination_broadcast_matches_oracle():
    bench = _bench_texts()
    out = contamination_check(_docs(), bench, n=N).to_pandas()
    oracle = _oracle(_docs().to_pandas(), bench)
    got = {int(r.doc_id): (int(r.n_grams), int(r.n_matched))
           for r in out.itertuples()}
    assert got == oracle
    assert len(got) >= 5  # the seeded docs at minimum
    f = out["frac_matched"]
    assert ((f > 0) & (f <= 1.0 + 1e-12)).all()
    # the seeded docs are fully contaminated (they ARE benchmark docs)
    seeded = out[out.doc_id.isin(range(5))]
    assert (seeded["n_matched"] == seeded["n_grams"]).all()


def test_contamination_distributed_path_agrees():
    bench = _bench_texts()
    a = contamination_check(_docs(), bench, n=N).to_pandas()
    b = contamination_check(_docs(), bench, n=N,
                            force_distributed=True,
                            num_partitions=8).to_pandas()
    cols = ["doc_id", "n_grams", "n_matched"]
    a = a[cols].sort_values("doc_id").reset_index(drop=True)
    b = b[cols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_contamination_no_overlap_and_empty_benchmark():
    out = contamination_check(
        _docs(), ["totally novel qqq www eee rrr ttt"], n=N).to_pandas()
    assert len(out) == 0
    out2 = contamination_check(_docs(), [], n=N).to_pandas()
    assert len(out2) == 0
    assert benchmark_ngram_hashes([], n=N).size == 0


def test_contamination_partitioning_invariant():
    bench = _bench_texts()
    a = contamination_check(_docs(), bench, n=N).to_pandas()
    b = contamination_check(_docs().repartition(11), bench,
                            n=N).to_pandas()
    cols = ["doc_id", "n_grams", "n_matched"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values("doc_id").reset_index(drop=True),
        b[cols].sort_values("doc_id").reset_index(drop=True))
