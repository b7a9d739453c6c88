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


def test_hash_semi_join():
    from centrality_gpu_ray.stages.shuffle import hash_semi_join

    rows = pa.table({"id": pa.array(list(range(100)), type=pa.int64()),
                     "payload": pa.array([f"p{i}" for i in range(100)])})
    keys = pa.table({"id": pa.array([3, 17, 42, 99, 1000], type=pa.int64())})
    out = hash_semi_join(ray.data.from_arrow(rows).repartition(4),
                         ray.data.from_arrow(keys), on="id",
                         num_partitions=8).to_pandas().sort_values("id")
    assert out["id"].tolist() == [3, 17, 42, 99]
    assert out["payload"].tolist() == ["p3", "p17", "p42", "p99"]
    assert list(out.columns) == ["id", "payload"]  # order preserved


def test_hash_lookup_join_inner_and_outer_default():
    from centrality_gpu_ray.stages.shuffle import hash_lookup_join

    rows = pa.table({"a": pa.array([1, 2, 3, 4], type=pa.int64())})
    d = pa.table({"doc_id": pa.array([1, 3], type=pa.int64()),
                  "text": pa.array(["one", "three"])})
    inner = hash_lookup_join(ray.data.from_arrow(rows),
                             ray.data.from_arrow(d), "a", "doc_id",
                             {"text": "t"}, num_partitions=4) \
        .to_pandas().sort_values("a")
    assert inner["a"].tolist() == [1, 3]
    assert inner["t"].tolist() == ["one", "three"]

    ints = pa.table({"doc_id": pa.array([1, 3], type=pa.int64()),
                     "cluster": pa.array([10, 30], type=pa.int64())})
    outer = hash_lookup_join(ray.data.from_arrow(rows),
                             ray.data.from_arrow(ints), "a", "doc_id",
                             {"cluster": "c"}, num_partitions=4,
                             outer_default_row_key=True) \
        .to_pandas().sort_values("a")
    assert outer["a"].tolist() == [1, 2, 3, 4]
    assert outer["c"].tolist() == [10, 2, 30, 4]  # defaults to own key


def test_hash_mark_min():
    from centrality_gpu_ray.stages.shuffle import hash_mark_min

    t = pa.table({"h": pa.array([7, 7, 8, 8, 8, 9], type=pa.int64()),
                  "doc_id": pa.array([5, 2, 9, 1, 4, 6], type=pa.int64())})
    marked = hash_mark_min(ray.data.from_arrow(t).repartition(3),
                           key="h", order="doc_id",
                           num_partitions=4).to_pandas()
    keep = set(marked.loc[marked.keep, "doc_id"])
    assert keep == {2, 1, 6}
    winners = hash_mark_min(ray.data.from_arrow(t), key="h",
                            order="doc_id", num_partitions=4,
                            winners_only=True).to_pandas()
    assert sorted(winners["doc_id"]) == [1, 2, 6]


def test_hash_partition_apply_groups_colocated():
    from centrality_gpu_ray.stages.shuffle import hash_partition_apply

    t = pa.table({"g": pa.array([1, 1, 2, 2, 2, 3], type=pa.int64()),
                  "v": pa.array([10, 20, 1, 2, 3, 7], type=pa.int64())})

    def per_group_sum(tbl):
        import numpy as np

        if tbl.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64())})
        g = tbl.column("g").to_numpy()
        v = tbl.column("v").to_numpy()
        uniq, inv = np.unique(g, return_inverse=True)
        return pa.table({"g": pa.array(uniq),
                         "s": pa.array(np.bincount(inv, weights=v).astype(np.int64))})

    out = hash_partition_apply(ray.data.from_arrow(t).repartition(3),
                               ["g"], per_group_sum,
                               num_partitions=4).to_pandas().sort_values("g")
    assert dict(zip(out["g"], out["s"])) == {1: 30, 2: 6, 3: 7}


def test_hash_lookup_join_empty_dict_outer_fill():
    import pyarrow as pa
    import ray.data

    from centrality_gpu_ray.stages.shuffle import hash_lookup_join

    rows = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "x": [10, 20, 30]}))
    empty = ray.data.from_arrow(
        pa.table({"k": pa.chunked_array([[]], pa.int64()),
                  "c": pa.chunked_array([[]], pa.int64())}))
    # outer_fill keeps every row with the fill value
    out = hash_lookup_join(rows, empty, "k", "k", {"c": "c"},
                           num_partitions=4, outer_fill={"c": 0})
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert df["c"].tolist() == [0, 0, 0]
    assert df["x"].tolist() == [10, 20, 30]
    # inner stays empty
    inner = hash_lookup_join(rows, empty, "k", "k", {"c": "c"},
                             num_partitions=4)
    assert inner.count() == 0


def test_hash_lookup_join_outer_fill_dtype_pinned_to_dict():
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from centrality_gpu_ray.stages.shuffle import hash_lookup_join

    rows = ray.data.from_arrow(pa.table({"k": list(range(12)),
                                         "x": list(range(12))}))
    # float64 dict that misses many keys: no-match partitions must emit
    # float64 fills, not int64 (schema divergence across blocks)
    fdict = ray.data.from_arrow(pa.table({"k": [3], "val": [2.5]}))
    out = hash_lookup_join(rows, fdict, "k", "k", {"val": "val"},
                           num_partitions=8, outer_fill={"val": 0})
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert df["val"].dtype == "float64"
    assert df.loc[3, "val"] == 2.5
    assert (df.drop(index=3)["val"] == 0.0).all()

    # fully empty float dict: same pinning via the fast path
    fempty = ray.data.from_arrow(
        pa.table({"k": pa.chunked_array([[]], pa.int64()),
                  "val": pa.chunked_array([[]], pa.float64())}))
    out2 = hash_lookup_join(rows, fempty, "k", "k", {"val": "val"},
                            num_partitions=4, outer_fill={"val": 0})
    df2 = out2.to_pandas()
    assert df2["val"].dtype == "float64"
    assert (df2["val"] == 0.0).all()


def test_hash_equi_join_nm_vs_duckdb():
    """N:M inner equi-join vs DuckDB on orders x lineitem (duplicate
    keys on the lineitem side, 1:N) and on a synthetic N:M case."""
    import duckdb
    import ray.data

    sf = "/root/testdata/sf0.001"
    from centrality_gpu_ray.stages.shuffle import hash_equi_join

    orders = ray.data.read_parquet(f"{sf}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    li = ray.data.read_parquet(f"{sf}/lineitem.parquet",
                               columns=["l_orderkey", "l_linenumber"])
    out = hash_equi_join(orders, li, on="o_orderkey",
                         right_on="l_orderkey",
                         num_partitions=8).to_pandas()
    oracle = duckdb.execute(f"""
        SELECT o_orderkey, o_custkey, l_linenumber
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/lineitem.parquet') l
          ON o.o_orderkey = l.l_orderkey""").fetch_df()
    cols = ["o_orderkey", "o_custkey", "l_linenumber"]
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = oracle[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_hash_equi_join_duplicates_both_sides_and_collisions():
    import ray.data

    from centrality_gpu_ray.stages.shuffle import hash_equi_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3], type=pa.int64()),
        "v": pa.array([10, 11, 20, 30], type=pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2], type=pa.int64()),
        "v": pa.array([100, 101, 102, 200], type=pa.int64())}))
    out = hash_equi_join(left, right, on="k",
                         num_partitions=4).to_pandas()
    # N:M expansion: key 1 -> 2*3 rows, key 2 -> 1, key 3 -> dropped
    assert len(out) == 7
    assert set(out.columns) == {"k", "v", "v_r"}
    assert sorted(out.loc[out.k == 1, "v_r"].unique()) == [100, 101, 102]
    assert (out.loc[out.k == 2, "v_r"] == 200).all()
    assert 3 not in set(out.k)


def test_hash_equi_join_empty_side():
    import ray.data

    from centrality_gpu_ray.stages.shuffle import hash_equi_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], type=pa.int64()),
        "v": pa.array([10, 20], type=pa.int64())}))
    empty = ray.data.from_arrow(pa.table({
        "k": pa.array([], type=pa.int64()),
        "w": pa.array([], type=pa.int64())}))
    out = hash_equi_join(left, empty, on="k", num_partitions=4)
    df = out.to_pandas()
    assert len(df) == 0


def test_hash_group_topk_vs_duckdb_row_number():
    import duckdb
    import ray.data

    from centrality_gpu_ray.stages.shuffle import hash_group_topk

    sf = "/root/testdata/sf0.01"
    ev = ray.data.read_parquet(f"{sf}/events.parquet",
                               columns=["event_id", "user_id", "value"])
    out = hash_group_topk(ev, ["user_id"], "value", k=3,
                          tiebreak=["event_id"],
                          num_partitions=8).to_pandas()
    oracle = duckdb.execute(f"""
        SELECT event_id, user_id, value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY value DESC, event_id) AS rn
          FROM read_parquet('{sf}/events.parquet'))
        WHERE rn <= 3""").fetch_df()
    cols = ["user_id", "event_id", "value"]
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = oracle[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_hash_group_topk_string_keys_ascending():
    import duckdb
    import ray.data

    from centrality_gpu_ray.stages.shuffle import hash_group_topk

    sf = "/root/testdata/sf0.01"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])
    out = hash_group_topk(docs, ["lang"], "n_chars", k=2,
                          descending=False, tiebreak=["doc_id"],
                          num_partitions=4).to_pandas()
    oracle = duckdb.execute(f"""
        SELECT doc_id, lang, n_chars FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY n_chars ASC, doc_id) AS rn
          FROM read_parquet('{sf}/documents.parquet'))
        WHERE rn <= 2""").fetch_df()
    cols = ["lang", "doc_id", "n_chars"]
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = oracle[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # groups smaller than k come back whole
    assert (out.groupby("lang").size() <= 2).all()


def test_hash_anti_join_vs_duckdb_not_exists():
    import duckdb
    import ray.data

    from centrality_gpu_ray.stages.shuffle import (
        hash_anti_join, hash_semi_join)

    sf = "/root/testdata/sf0.001"
    cust = ray.data.read_parquet(f"{sf}/customer.parquet",
                                 columns=["c_custkey", "c_name"])
    # every customer has SOME order at this sf, so anti-join against a
    # deterministic subset (every third order) to get a non-empty result
    orders = ray.data.read_parquet(f"{sf}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"]) \
        .map_batches(
            lambda t: t.filter(
                pa.compute.equal(
                    pa.compute.bit_wise_and(t.column("o_orderkey"), 3), 0))
            .select(["o_custkey"]).rename_columns(["c_custkey"]),
            batch_format="pyarrow")
    out = hash_anti_join(cust, orders, "c_custkey",
                         num_partitions=8).to_pandas()
    oracle = duckdb.execute(f"""
        SELECT c_custkey, c_name FROM read_parquet('{sf}/customer.parquet') c
        WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{sf}/orders.parquet') o
                          WHERE o.o_custkey = c.c_custkey
                            AND (o.o_orderkey & 3) = 0)
        ORDER BY c_custkey""").fetch_df()
    assert len(oracle) > 0
    a = out.sort_values("c_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, oracle, check_dtype=False)
    # semi + anti partition the input exactly
    n_semi = hash_semi_join(cust, orders, "c_custkey",
                            num_partitions=8).count()
    assert n_semi + len(out) == cust.count()


def test_hash_anti_join_empty_key_side_keeps_all():
    import pyarrow as pa
    import ray.data

    from centrality_gpu_ray.stages.shuffle import hash_anti_join

    rows = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "v": [9, 8, 7]}))
    empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    out = hash_anti_join(rows, empty, "k", num_partitions=4).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2, 3]


def test_hash_group_quantiles_vs_duckdb_rank_rule():
    import duckdb
    import ray.data

    from centrality_gpu_ray.stages.shuffle import hash_group_quantiles

    sf = "/root/testdata/sf0.01"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["lang", "n_chars"])
    got = hash_group_quantiles(docs, ["lang"], "n_chars",
                               qs=(0.25, 0.5, 0.9),
                               num_partitions=4).to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    want = duckdb.execute(f"""
        WITH s AS (SELECT lang, n_chars AS v,
                          ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY n_chars) AS rn,
                          COUNT(*) OVER (PARTITION BY lang) AS n
                   FROM read_parquet('{sf}/documents.parquet')
                   WHERE n_chars IS NOT NULL)
        SELECT lang,
          CAST(MIN(CASE WHEN rn >= GREATEST(1, CEIL(0.25 * n)) THEN v END)
               AS DOUBLE) AS q25,
          CAST(MIN(CASE WHEN rn >= GREATEST(1, CEIL(0.5 * n)) THEN v END)
               AS DOUBLE) AS q50,
          CAST(MIN(CASE WHEN rn >= GREATEST(1, CEIL(0.9 * n)) THEN v END)
               AS DOUBLE) AS q90
        FROM s GROUP BY lang ORDER BY lang""").fetch_df()
    pd.testing.assert_frame_equal(got[["lang", "q25", "q50", "q90"]],
                                  want, check_dtype=False)


def test_key_hash_nullable_int_blocks_route_together():
    """An int64 key must route to the SAME partition whether or not
    its block happens to contain a null elsewhere (to_numpy float-
    coerces int64-with-null blocks; hashing 5.0 as object vs raw 5
    would split one group across reduces). Nulls form their own
    group."""
    clean = pa.table({"k": pa.array([5] * 30, type=pa.int64()),
                      "v": pa.array(np.ones(30, dtype=np.int64))})
    nully = pa.table({
        "k": pa.array([5] * 30 + [None, None], type=pa.int64()),
        "v": pa.array(np.ones(32, dtype=np.int64))})
    ds = ray.data.from_arrow(clean).union(ray.data.from_arrow(nully))
    got = hash_aggregate(ds, keys=["k"], aggs=[("v", "sum")],
                         num_partitions=8).to_pandas()
    vals = {("<null>" if pd.isna(k) else int(k)): int(s)
            for k, s in zip(got["k"], got["v"])}
    assert vals[5] == 60          # ONE row for key 5, fully merged
    assert vals["<null>"] == 2
    assert len(vals) == 2


def test_key_hash_bool_keys_route_and_aggregate():
    """Boolean key columns must survive _key_hash (fill_null(0) into a
    bool column raises ArrowInvalid), with and without nulls."""
    clean = pa.table({"flag": pa.array([True, False] * 10),
                      "v": pa.array(np.ones(20, dtype=np.int64))})
    nully = pa.table({"flag": pa.array([True, None] * 5),
                      "v": pa.array(np.ones(10, dtype=np.int64))})
    ds = ray.data.from_arrow(clean).union(ray.data.from_arrow(nully))
    got = hash_aggregate(ds, keys=["flag"], aggs=[("v", "sum")],
                         num_partitions=4).to_pandas()
    vals = {("<null>" if pd.isna(k) else bool(k)): int(s)
            for k, s in zip(got["flag"], got["v"])}
    assert vals == {True: 15, False: 10, "<null>": 5}


def test_hash_mark_min_carry_key():
    from centrality_gpu_ray.stages.shuffle import hash_mark_min

    tbl = pa.table({"h": pa.array([10, 10, 20, 30, 30, 30],
                                  type=pa.int64()),
                    "id": pa.array([7, 3, 9, 5, 1, 2], type=pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = hash_mark_min(ds, key="h", order="id", num_partitions=4,
                        winners_only=True, carry_key=True).to_pandas()
    assert dict(zip(got["h"], got["id"])) == {10: 3, 20: 9, 30: 1}
    assert got["keep"].all()
