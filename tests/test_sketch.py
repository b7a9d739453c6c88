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


# --- histogram / quantiles -------------------------------------------------

from centrality_gpu_ray.functions.sketch import (  # noqa: E402
    HistogramSketch, cms_build, cms_from_values, cms_query,
    column_histogram, column_quantiles)


def _rank_quantile_sql(table_path, col, q):
    """The shared rank rule: smallest value with cum count >= ceil(q*n)."""
    return duckdb.execute(f"""
        WITH s AS (SELECT {col} AS v,
                          ROW_NUMBER() OVER (ORDER BY {col}) AS rn,
                          COUNT(*) OVER () AS n
                   FROM read_parquet('{table_path}')
                   WHERE {col} IS NOT NULL)
        SELECT MIN(v) FROM s WHERE rn >= GREATEST(1, CEIL({q} * n))
        """).fetchone()[0]


def test_exact_int_histogram_quantiles_vs_duckdb():
    path = f"{SF}/documents.parquet"
    docs = ray.data.read_parquet(path, columns=["n_chars"])
    h = column_histogram(docs, "n_chars")
    assert h.exact
    for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99, 1.0):
        assert h.quantile(q) == _rank_quantile_sql(path, "n_chars", q), q
    # partitioning invariance of the merged counts
    h2 = column_histogram(docs.repartition(7), "n_chars")
    assert np.array_equal(h.counts, h2.counts)


def test_binned_histogram_quantiles_tolerance():
    path = f"{SF}/lineitem.parquet"
    li = ray.data.read_parquet(path, columns=["l_extendedprice"])
    h = column_histogram(li, "l_extendedprice", bins=4096)
    assert not h.exact
    width = (h.hi - h.lo) / h.counts.size
    for q in (0.25, 0.5, 0.9):
        exact = float(_rank_quantile_sql(path, "l_extendedprice", q))
        assert abs(h.quantile(q) - exact) <= width, (q, h.quantile(q), exact)


def test_column_quantiles_convenience():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["n_chars"])
    out = column_quantiles(docs, "n_chars", qs=(0.5,))
    assert set(out) == {"q50"} and out["q50"] > 0


def test_histogram_sketch_rank_rule_unit():
    # counts for values 10,10,11,13 at lo=10
    h = HistogramSketch(np.array([2, 1, 0, 1]), 10, 13, exact=True)
    assert h.quantile(0.0) == 10 and h.quantile(0.5) == 10
    assert h.quantile(0.75) == 11 and h.quantile(1.0) == 13


# --- count-min sketch ------------------------------------------------------

def test_cms_never_underestimates_and_merge_is_sum():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 500, size=20_000)
    cms = cms_from_values(vals, depth=4, width=2048)
    a, b = vals[:9_000], vals[9_000:]
    merged = (cms_from_values(a, 4, 2048) + cms_from_values(b, 4, 2048))
    assert np.array_equal(cms, merged)
    probe = np.arange(500)
    exact = np.bincount(vals, minlength=500)
    est = cms_query(cms, probe)
    assert np.all(est >= exact)
    # eps*N bound (eps = e/width) holds per query with prob 1-e^-depth;
    # over 500 probes expect a few-percent tail, so assert the rate and
    # a generous hard cap rather than per-probe.
    over = est - exact
    assert np.mean(over <= np.e / 2048 * vals.size) >= 0.95
    assert np.all(over <= np.e / 2048 * vals.size * 10)


def test_cms_token_counts_vs_duckdb():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["text"])
    cms = cms_build(docs, "text", depth=4, width=16384, tokens=True)
    top = duckdb.execute(r"""
        SELECT tok, COUNT(*) AS c FROM (
          SELECT unnest(regexp_split_to_array(TRIM(text), '\s+')) AS tok
          FROM read_parquet('""" + SF + r"""/documents.parquet')
          WHERE LENGTH(TRIM(COALESCE(text, ''))) > 0)
        GROUP BY tok ORDER BY c DESC, tok LIMIT 20""").fetchall()
    toks = np.asarray([t for t, _ in top], dtype=object)
    exact = np.asarray([c for _, c in top], dtype=np.int64)
    est = cms_query(cms, toks)
    n_tokens = int(duckdb.execute(r"""
        SELECT COUNT(*) FROM (
          SELECT unnest(regexp_split_to_array(TRIM(text), '\s+')) AS tok
          FROM read_parquet('""" + SF + r"""/documents.parquet')
          WHERE LENGTH(TRIM(COALESCE(text, ''))) > 0)""").fetchone()[0])
    assert np.all(est >= exact)
    assert np.all(est - exact <= np.e / 16384 * n_tokens * 4)


def test_filter_by_quantile_vs_duckdb():
    from centrality_gpu_ray.functions.sketch import filter_by_quantile

    path = f"{SF}/documents.parquet"
    docs = ray.data.read_parquet(path, columns=["doc_id", "n_chars"])
    out, (lo_v, hi_v) = filter_by_quantile(docs, "n_chars",
                                           lo_q=0.1, hi_q=0.9)
    got = sorted(out.to_pandas()["doc_id"].tolist())
    lo_sql = _rank_quantile_sql(path, "n_chars", 0.1)
    hi_sql = _rank_quantile_sql(path, "n_chars", 0.9)
    assert (lo_v, hi_v) == (lo_sql, hi_sql)
    want = duckdb.execute(
        f"SELECT doc_id FROM read_parquet('{path}') "
        f"WHERE n_chars BETWEEN {lo_sql} AND {hi_sql} "
        f"ORDER BY doc_id").fetchdf()["doc_id"].tolist()
    assert got == want
    # lo_q=0 keeps the bottom tail
    all_out, (lo0, _) = filter_by_quantile(docs, "n_chars", hi_q=1.0)
    assert all_out.count() == docs.count() and lo0 == -np.inf


def test_float_column_with_integral_endpoints_stays_binned():
    import pyarrow as pa

    # min=0.0 / max=10.0 are whole numbers but the values between are
    # fractional — exact (floor-bin) mode would corrupt the quantiles
    vals = np.concatenate([[0.0, 10.0], np.full(98, 0.5)])
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals)}))
    h = column_histogram(ds, "x", bins=1000)
    assert not h.exact
    # median must land on 0.5's bucket, not floor to 0
    assert abs(h.quantile(0.5) - 0.5) < (10.0 / 1000) + 1e-9


# ---------------------------------------------------------------------------
# hll_distinct_by_group — per-group approximate COUNT(DISTINCT)
# ---------------------------------------------------------------------------

import pandas as pd
import pyarrow as pa

def test_hll_by_group_accuracy_and_partitioning_invariance():
    import ray.data

    from centrality_gpu_ray.functions.sketch import hll_distinct_by_group

    rng = np.random.default_rng(5)
    n = 30_000
    langs = np.array(["en", "de", "fr", "ja"])[rng.integers(0, 4, n)]
    # per-group distinct cardinalities differ by an order of magnitude
    dom = np.where(langs == "en",
                   rng.integers(0, 5000, n),
                   rng.integers(0, 300, n)).astype(np.int64)
    df = pd.DataFrame({"lang": langs, "domain": dom})
    exact = df.groupby("lang")["domain"].nunique()

    got_by_parts = []
    for parts in (2, 9):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = hll_distinct_by_group(ds, "lang", "domain", p=12) \
            .to_pandas().set_index("lang")["approx_distinct"]
        got_by_parts.append(got.sort_index())
        for lang, true in exact.items():
            rel = abs(got[lang] - true) / true
            assert rel < 5 * 1.04 / np.sqrt(1 << 12), (lang, got[lang], true)
    # the max-merge is associative/commutative: estimates are EXACTLY
    # partitioning-invariant
    pd.testing.assert_series_equal(got_by_parts[0], got_by_parts[1])


def test_hll_by_group_null_values_and_null_groups():
    import ray.data

    from centrality_gpu_ray.functions.sketch import hll_distinct_by_group

    tbl = pa.table({
        "g": pa.array(["a", "a", None, "b", None, "a"]),
        "v": pa.array([1, 2, 3, None, 4, None], type=pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = hll_distinct_by_group(ds, "g", "v", p=10).to_pandas()
    as_dict = {("<null>" if pd.isna(k) else k): v for k, v in
               zip(got["g"], got["approx_distinct"])}
    # small counts hit the linear-counting regime -> exact here
    assert round(as_dict["a"]) == 2          # null value didn't count
    assert round(as_dict["<null>"]) == 2     # null group is a group
    assert "b" not in as_dict                # its only value was null


def test_hll_by_group_int_keys_above_2_53_stay_exact():
    """factorize over a float-coerced block would ROUND int64 group
    keys above 2^53 when the block also holds a null group — the
    Arrow-level dictionary grouping must keep them exact."""
    import ray.data

    from centrality_gpu_ray.functions.sketch import hll_distinct_by_group

    big = (1 << 53) + 1
    tbl = pa.table({
        "g": pa.array([big] * 20 + [big + 2] * 20 + [None] * 3,
                      type=pa.int64()),
        "v": pa.array(list(range(20)) + list(range(10)) * 2 + [1, 2, 3],
                      type=pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(3)
    # read back as ARROW: to_pandas would float-coerce the
    # int64-with-null group column and round the keys in the TEST
    out = pa.concat_tables(
        b for b in hll_distinct_by_group(ds, "g", "v", p=12)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    as_dict = {("<null>" if k is None else k): round(v)
               for k, v in zip(out.column("g").to_pylist(),
                               out.column("approx_distinct").to_pylist())}
    assert as_dict == {big: 20, big + 2: 10, "<null>": 3}


def test_hll_by_group_nullable_int_values_do_not_split():
    """A null VALUE in one block must not float-coerce that block's
    int64 values onto a different hash family (5 vs 5.0 counting as
    two distincts), and a null in an int GROUP block must not split
    the group's partials across partitions."""
    import ray.data

    from centrality_gpu_ray.functions.sketch import hll_distinct_by_group

    clean = pa.table({"g": pa.array([7] * 40, type=pa.int64()),
                      "v": pa.array(list(range(40)), type=pa.int64())})
    nully = pa.table({
        "g": pa.array([7] * 40 + [None], type=pa.int64()),
        "v": pa.array(list(range(40)) + [None], type=pa.int64())})
    ds = ray.data.from_arrow(clean).union(ray.data.from_arrow(nully))
    got = hll_distinct_by_group(ds, "g", "v", p=12).to_pandas()
    sub = got[got["g"].notna()]
    assert len(sub) == 1                      # ONE row for group 7
    assert round(float(sub["approx_distinct"].iloc[0])) == 40
