"""The __ray_entry__ driver contract: entry(), queries(), oracle_sql()."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows():
    out = entrymod.entry()
    assert len(out) > 0
    assert set(out.columns) == {"node", "pagerank"}
    assert abs(out["pagerank"].sum() - 1.0) < 1e-8


def test_query_and_oracle_keys_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    # the driver emits CORRECTNESS rows for at most 50 queries —
    # registering more silently drops evidence (bit round 2)
    assert len(qs) <= 50
    # the round-2 driver-unchecked family must sit inside any row cap
    first10 = list(qs)[:10]
    for name in ("minhash_dedup_docs", "simhash_pairs", "ann_topk",
                 "multimodal_features", "embedding_near_dup_ids"):
        assert name in first10
    # every oracle has a query; non-SQL-expressible queries may omit oracles
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 15


@pytest.mark.parametrize("name", [
    "graph_pagerank_fixed", "graph_components", "minhash_dedup_docs",
    "doc_quality"])
def test_rows_only_queries_smoke(name):
    out = entrymod.queries()[name](SF)
    df = out if hasattr(out, "columns") and not hasattr(out, "to_pandas") \
        else out.to_pandas()
    assert len(df) > 0
