"""Bloom filter: no-false-negative guarantee (exact), FPR bound,
merge-is-union, partitioning invariance, dtype canonicalization (the
CMS ADVICE lesson), and the filter fast path."""

import numpy as np
import pandas as pd
import pyarrow as pa

from centrality_gpu_ray.functions.sketch import (bloom_build,
                                                 bloom_contains,
                                                 bloom_from_values,
                                                 bloom_merge,
                                                 filter_by_bloom)


def _mk(n=5000, seed=5):
    rng = np.random.default_rng(seed)
    ids = rng.choice(10_000_000, size=n, replace=False).astype(np.int64)
    return ids


def test_no_false_negatives_and_fpr_bound():
    import ray.data

    ids = _mk()
    ds = ray.data.from_arrow(pa.table({"key": pa.array(ids)}))
    bl = bloom_build(ds, "key", capacity=len(ids), fpr=0.01)
    # EXACT: every inserted key is a member
    assert bloom_contains(bl, ids).all()
    # fresh keys (disjoint range) false-positive below ~3x the target
    fresh = np.arange(20_000_000, 20_050_000, dtype=np.int64)
    fp = bloom_contains(bl, fresh).mean()
    assert fp < 0.03, fp


def test_partitioning_invariance_is_merge_union():
    import ray.data

    ids = _mk(seed=9)
    t = pa.table({"key": pa.array(ids)})
    b1 = bloom_build(ray.data.from_arrow(t).repartition(1), "key",
                     capacity=len(ids))
    b8 = bloom_build(ray.data.from_arrow(t).repartition(8), "key",
                     capacity=len(ids))
    np.testing.assert_array_equal(b1["bits"], b8["bits"])
    # explicit two-filter union == single build over the union
    lo, hi = ids[:2500], ids[2500:]
    u = bloom_merge(bloom_from_values(lo, capacity=len(ids)),
                    bloom_from_values(hi, capacity=len(ids)))
    np.testing.assert_array_equal(u["bits"], b1["bits"])


def test_dtype_canonicalization():
    bl = bloom_from_values(np.array([1, 2, 3], dtype=np.int64),
                           capacity=100)
    # plain Python list of ints must hash on the same path
    assert bloom_contains(bl, [1, 2, 3]).all()
    assert not bloom_contains(bl, [4])[0]
    # string filters work too
    bs = bloom_from_values(np.array(["a", "b"], dtype=object),
                           capacity=10)
    assert bloom_contains(bs, np.array(["a"], dtype=object))[0]
    got = bloom_contains(bs, np.array(["zz_fresh"], dtype=object))
    assert got.shape == (1,)


def test_filter_by_bloom_drop_and_keep():
    import ray.data

    ids = _mk(n=2000, seed=13)
    deny = ids[:500]
    bl = bloom_from_values(deny, capacity=500, fpr=0.001)
    df = pd.DataFrame({"key": ids, "v": np.arange(len(ids))})
    ds = ray.data.from_pandas(df).repartition(4)
    kept = filter_by_bloom(ds, "key", bl).to_pandas()
    # every denylisted row IS dropped (no false negatives)
    assert not set(deny) & set(kept["key"])
    # ~fpr of the rest may be collateral; at 0.001 over 1500 rows
    # expect ~1.5 — allow a generous bound
    assert len(kept) >= 1500 - 20
    # payload columns ride through
    assert set(kept.columns) == {"key", "v"}
    hits = filter_by_bloom(ds, "key", bl, keep_hits=True).to_pandas()
    assert set(deny) <= set(hits["key"])
    assert len(hits) + len(kept) == len(ids)


def test_validation_and_empty():
    import pytest
    import ray.data

    with pytest.raises(ValueError):
        bloom_from_values(np.array([1]), capacity=1, fpr=0.0)
    a = bloom_from_values(np.array([1]), capacity=10)
    b = bloom_from_values(np.array([1]), capacity=10_000)
    with pytest.raises(ValueError):
        bloom_merge(a, b)
    empty = ray.data.from_pandas(
        pd.DataFrame({"key": pd.Series([], dtype=np.int64)}))
    be = bloom_build(empty, "key", capacity=10)
    assert not bloom_contains(be, np.array([7], dtype=np.int64))[0]
    assert filter_by_bloom(empty, "key", a).count() == 0

def test_bloom_null_rows_do_not_break_guarantee():
    """One null in an int64 column must not coerce the block to float64
    and switch the hash family: every inserted key stays a member, and
    filter_by_bloom treats null keys as non-members (kept by the drop
    path, dropped by keep_hits=True)."""
    import ray.data

    from centrality_gpu_ray.functions.sketch import (bloom_build,
                                                     bloom_contains,
                                                     filter_by_bloom)

    ids = np.arange(100, dtype=np.int64)
    tbl = pa.table({"k": pa.array(list(ids) + [None], type=pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(3)
    bl = bloom_build(ds, "k", capacity=200, fpr=0.01)
    assert bloom_contains(bl, ids).all()   # no false negatives

    probe = pa.table({"k": pa.array([1, None, 2, 999_999], type=pa.int64())})
    kept = filter_by_bloom(ray.data.from_arrow(probe), "k", bl) \
        .to_pandas()  # drop members -> null + fresh key survive
    assert kept["k"].isna().sum() == 1
    assert set(kept["k"].dropna().astype(np.int64)) <= {999_999}
    hits = filter_by_bloom(ray.data.from_arrow(probe), "k", bl,
                           keep_hits=True).to_pandas()
    assert set(hits["k"].astype(np.int64)) == {1, 2}
