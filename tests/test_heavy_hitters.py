"""Misra–Gries heavy hitters vs exact pandas counts: lower/upper
bounds contain the truth, the frequency>D presence guarantee holds,
D==0 exactness when distinct ≤ k, and partitioning invariance of the
guarantees (the summary itself may differ by partitioning — the
BOUNDS may not lie)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from centrality_gpu_ray.functions.sketch import _mg_compress, heavy_hitters


def _zipf_corpus(n=40_000, vocab=2_000, seed=3):
    rng = np.random.default_rng(seed)
    vals = (rng.zipf(1.3, size=n) % vocab).astype(np.int64)
    return pd.DataFrame({"v": vals})


def _exact(df):
    return df["v"].astype(str).value_counts()


def test_bounds_contain_truth_and_presence_guarantee():
    import ray.data

    df = _zipf_corpus()
    exact = _exact(df)
    for parts in (1, 8):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = heavy_hitters(ds, "v", k=64).to_pandas()
        D = int((got["count_hi"] - got["count_lo"]).iloc[0])
        assert (got["count_hi"] - got["count_lo"] == D).all()
        assert D <= len(df) // 65 + 1
        for _, row in got.iterrows():
            true = int(exact.get(row["value"], 0))
            assert row["count_lo"] <= true <= row["count_hi"], \
                (row["value"], row["count_lo"], true, row["count_hi"])
        # every value with true frequency > D is present
        must = set(exact[exact > D].index)
        assert must <= set(got["value"]), (parts, must - set(got["value"]))


def test_exact_when_few_distinct():
    import ray.data

    df = pd.DataFrame({"v": np.repeat(np.arange(10), [100 - i for i in
                                                      range(10)])})
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=0)) \
        .repartition(4)
    got = heavy_hitters(ds, "v", k=64).to_pandas()
    assert (got["count_hi"] == got["count_lo"]).all()  # D == 0 → exact
    exact = _exact(df)
    assert len(got) == 10
    for _, row in got.iterrows():
        assert row["count_lo"] == int(exact[row["value"]])
    # output ordering: count_lo desc, value asc tie-break
    assert list(got["count_lo"]) == sorted(got["count_lo"], reverse=True)


def test_strings_nulls_empty():
    import ray.data

    df = pd.DataFrame({"v": ["a", "a", "b", None, "c", "a", None]})
    got = heavy_hitters(ray.data.from_pandas(df), "v", k=8).to_pandas()
    assert dict(zip(got["value"], got["count_lo"])) == \
        {"a": 3, "b": 1, "c": 1}
    empty = ray.data.from_pandas(
        pd.DataFrame({"v": pd.Series([], dtype=object)}))
    assert heavy_hitters(empty, "v").num_rows == 0


def test_mg_compress_rule():
    c, dec = _mg_compress({"a": 10, "b": 5, "c": 3, "d": 1}, 2)
    assert dec == 3 and c == {"a": 7, "b": 2}
    c2, dec2 = _mg_compress({"a": 2, "b": 1}, 2)
    assert dec2 == 0 and c2 == {"a": 2, "b": 1}


def test_numeric_keys_stable_across_nullable_blocks():
    """A null in one block must not float-coerce that block's int64
    values ('5' vs '5.0' keys would split one value's count across two
    rows and break the count_hi upper bound)."""
    import ray.data

    t_clean = pa.table({"v": pa.array([5] * 50, type=pa.int64())})
    t_nully = pa.table({"v": pa.array([5] * 50 + [None], type=pa.int64())})
    ds = ray.data.from_arrow(t_clean).union(ray.data.from_arrow(t_nully))
    got = heavy_hitters(ds, "v", k=8).to_pandas()
    assert got["value"].tolist() == ["5"]
    assert int(got["count_lo"].iloc[0]) == 100
    assert int(got["count_hi"].iloc[0]) == 100
