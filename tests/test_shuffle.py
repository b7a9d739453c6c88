"""Explicit hash-shuffle aggregation: exactness + partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.stages.shuffle import hash_aggregate, hash_distinct


@pytest.fixture(scope="module")
def rows():
    rng = np.random.default_rng(17)
    n = 50_000
    return pa.table({
        "k": pa.array(rng.integers(0, 2_000, n)),
        "k2": pa.array(rng.integers(0, 5, n)),
        "x": pa.array(rng.integers(1, 100, n)),
        "f": pa.array(rng.standard_normal(n)),
    })


def _oracle(rows):
    df = rows.to_pandas()
    return (df.groupby(["k", "k2"], as_index=False)
            .agg(x=("x", "sum"), f=("f", "min"), count=("x", "size"))
            .sort_values(["k", "k2"]).reset_index(drop=True))


@pytest.mark.parametrize("parts", [1, 2, 8, 32])
def test_hash_aggregate_matches_pandas(rows, parts):
    ds = ray.data.from_arrow(rows).repartition(6)
    out = hash_aggregate(ds, ["k", "k2"],
                         [("x", "sum"), ("f", "min"), ("x", "count")],
                         num_partitions=parts)
    got = out.to_pandas().sort_values(["k", "k2"]).reset_index(drop=True)
    got.columns = ["k", "k2", "x", "f", "count"]
    want = _oracle(rows)
    pd.testing.assert_frame_equal(
        got.astype({"count": "int64"}), want.astype({"count": "int64"}),
        check_dtype=False)


def test_hash_aggregate_partition_invariance(rows):
    ds = ray.data.from_arrow(rows).repartition(4)
    a = hash_aggregate(ds, ["k"], [("x", "sum")], num_partitions=2) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    b = hash_aggregate(ds, ["k"], [("x", "sum")], num_partitions=8) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert a.equals(b)


def test_hash_distinct(rows):
    ds = ray.data.from_arrow(rows).repartition(5)
    out = hash_distinct(ds, ["k2"]).to_pandas()
    assert sorted(out["k2"]) == [0, 1, 2, 3, 4]


def test_hash_aggregate_string_keys():
    t = pa.table({"s": pa.array(["a", "b", "a", "c", "b", "a"]),
                  "v": pa.array([1, 2, 3, 4, 5, 6])})
    out = hash_aggregate(ray.data.from_arrow(t), ["s"], [("v", "sum")],
                         num_partitions=3).to_pandas().sort_values("s")
    assert dict(zip(out["s"], out["v"])) == {"a": 10, "b": 7, "c": 4}
