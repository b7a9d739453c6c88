"""HyperLogLog distinct-count sketch vs exact DuckDB cardinalities."""

import duckdb
import numpy as np
import ray.data

from centrality_gpu_ray.functions.sketch import (
    hll_distinct, hll_distinct_tokens, hll_estimate, hll_registers)

SF = "/root/testdata/sf0.01"


def test_hll_registers_merge_is_union():
    a = hll_registers(np.arange(0, 3000, dtype=np.int64), 12)
    b = hll_registers(np.arange(1500, 6000, dtype=np.int64), 12)
    u = hll_registers(np.arange(0, 6000, dtype=np.int64), 12)
    assert np.array_equal(np.maximum(a, b), u)
    # empty side is the identity
    z = hll_registers(np.empty(0, dtype=np.int64), 12)
    assert np.array_equal(np.maximum(a, z), a)


def test_hll_accuracy_synthetic():
    for n in (100, 5_000, 100_000):
        est = hll_estimate(hll_registers(np.arange(n, dtype=np.int64), 12))
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_distinct_on_dataset_vs_duckdb():
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_orderkey"])
    est = hll_distinct(li, "l_orderkey", p=12)
    exact = duckdb.execute(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM "
        f"read_parquet('{SF}/lineitem.parquet')").fetchone()[0]
    assert abs(est - exact) / exact < 0.05, (est, exact)
    # partitioning invariance: max-merge is order-independent
    est2 = hll_distinct(li.repartition(13), "l_orderkey", p=12)
    assert est == est2


def test_hll_distinct_tokens_vs_duckdb():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    est = hll_distinct_tokens(docs, p=12)
    exact = duckdb.execute(r"""
        SELECT COUNT(DISTINCT tok) FROM (
          SELECT unnest(regexp_split_to_array(TRIM(text), '\s+')) AS tok
          FROM read_parquet('""" + SF + r"""/documents.parquet')
          WHERE LENGTH(TRIM(COALESCE(text, ''))) > 0)""").fetchone()[0]
    # tiny true cardinality lands in the exact linear-counting regime
    assert abs(est - exact) / exact < 0.05, (est, exact)
