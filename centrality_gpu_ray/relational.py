"""Relational operator coverage over the TPC-H-ish testdata tables.

The graph engine's operator inventory (SURVEY.md §2) maps sources,
filters, projections, groupby-aggregates, joins, sorts, top-k and
histogram sinks onto Ray Data. This module exercises that same surface
on the standard tables so the driver's DuckDB oracle can value-check
each primitive end-to-end (rows, schema, values). Every aggregate
column is explicitly aliased to match the oracle SQL in
``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-style grouped aggregate with computed revenue column.

    Columns pruned at the read; revenue computed vectorized per Arrow
    batch; per-batch partial aggregation happens inside Ray's hash
    aggregate. Money is scaled to exact int64 "cents" before summing so
    the result is bit-identical to the SQL oracle regardless of float
    summation order (price_c = round(price·100), disc_pct =
    round(disc·100), revenue_c2 = price_c·(100−disc_pct), exact in
    cents²·10⁻²)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def add_exact_money(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": qty,
            "revenue_c2": rev,
            "disc_pct": disc_pct,
        })

    out = (ds.map_batches(add_exact_money, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("qty", alias_name="sum_qty"),
                      Sum("revenue_c2", alias_name="sum_revenue_c2"),
                      Sum("disc_pct", alias_name="sum_disc_pct"),
                      Count(alias_name="count_order")))
    return out.sort(["l_returnflag", "l_linestatus"])


def _orders_money(sf_dir: str):
    """orders fact stream with exact int64 cents, columns pruned."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def money(t: pa.Table) -> pa.Table:
        total_c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                          pa.int64())
        return pa.table({"o_custkey": t["o_custkey"], "total_c": total_c})

    return orders.map_batches(money, batch_format="pyarrow")


def revenue_by_mktsegment(sf_dir: str):
    """orders ⋈ customer → groupby segment. customer is SF-proportional
    (NOT a fixed-size dimension), so it must never be collected to the
    driver or broadcast: the engine's hash-partitioned lookup join
    co-partitions both sides on the customer key and attaches the
    segment inside the shuffle (``stages/shuffle.py::hash_lookup_join``)
    — the star-join shape that survives 100 TB facts with a 1 TB
    customer dimension."""
    from ray.data.aggregate import Count, Sum

    from centrality_gpu_ray.stages.shuffle import hash_lookup_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = hash_lookup_join(_orders_money(sf_dir), cust,
                              row_key="o_custkey", dict_key="c_custkey",
                              attach={"c_mktsegment": "c_mktsegment"},
                              num_partitions=16)
    out = joined.groupby("c_mktsegment").aggregate(
        Sum("total_c", alias_name="total_revenue_c"),
        Count(alias_name="num_orders"))
    return out.sort("c_mktsegment")


def revenue_by_nation(sf_dir: str):
    """3-table fact⋈dim⋈dim rollup (orders ⋈ customer ⋈ nation): the
    SF-scaled customer side goes through the hash-partitioned lookup
    join (never driver-collected); only the genuinely fixed-size nation
    table (25 rows) is broadcast via one ``ray.put``."""
    import ray
    from ray.data.aggregate import Count, Sum

    from centrality_gpu_ray.stages.shuffle import hash_lookup_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name"]).to_pandas() \
        .sort_values("n_nationkey")
    nat_ref = ray.put((nation["n_nationkey"].to_numpy(),
                       nation["n_name"].to_numpy()))

    joined = hash_lookup_join(_orders_money(sf_dir), cust,
                              row_key="o_custkey", dict_key="c_custkey",
                              attach={"c_nationkey": "c_nationkey"},
                              num_partitions=16)

    def add_nation(t: pa.Table, _ref=nat_ref) -> pa.Table:
        keys, names = ray.get(_ref)
        idx = np.searchsorted(keys, t.column("c_nationkey").to_numpy())
        return pa.table({"n_name": pa.array(names[idx], type=pa.string()),
                         "total_c": t["total_c"]})

    out = (joined.map_batches(add_nation, batch_format="pyarrow")
           .groupby("n_name").aggregate(
               Sum("total_c", alias_name="total_revenue_c"),
               Count(alias_name="num_orders")))
    return out.sort("n_name")


def top_parts_by_quantity(sf_dir: str, k: int = 25):
    """Top-k with deterministic tie-break (O8): sort (−qty, key) + limit."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    agg = ds.groupby("l_partkey").aggregate(Sum("l_quantity", alias_name="total_qty"))
    return agg.sort(["total_qty", "l_partkey"], descending=[True, False]).limit(k)


def events_by_type(sf_dir: str):
    """events groupby with multiple aggregates (stream-shaped table)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def add_milli(t: pa.Table) -> pa.Table:
        v_m = pc.cast(pc.round(pc.multiply(t["value"], 1000.0)), pa.int64())
        return t.append_column("value_m", v_m)

    out = (ds.map_batches(add_milli, batch_format="pyarrow")
           .groupby("event_type").aggregate(
               Count(alias_name="n"),
               Sum("value_m", alias_name="sum_value_m"),
               Min("value", alias_name="min_value"),
               Max("value", alias_name="max_value")))
    return out.sort("event_type")


def events_hourly_windows(sf_dir: str):
    """Tumbling 1-hour event-time windows as a grouped aggregate
    (ray_guide 'Streaming-shaped workloads'): window start =
    floor(ts to hour); no watermark semantics needed for batch."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"], unit="hour")
        v_m = pc.cast(pc.round(pc.multiply(t["value"], 1000.0)), pa.int64())
        return pa.table({"window_start": w, "event_type": t["event_type"],
                         "value_m": v_m})

    out = (ds.map_batches(add_window, batch_format="pyarrow")
           .groupby(["window_start", "event_type"])
           .aggregate(Count(alias_name="n"), Sum("value_m", alias_name="sum_value_m")))
    return out.sort(["window_start", "event_type"])


def events_sliding_windows(sf_dir: str, window_min: int = 60,
                           slide_min: int = 15):
    """Sliding event-time windows (60 min window, 15 min slide): each
    event replicates into window/slide = 4 windows inside the batch
    map (the standard stream-engine expansion), then one grouped
    count/sum — integer-exact."""
    from ray.data.aggregate import Count, Sum

    k = window_min // slide_min
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def expand(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t["ts"], multiple=slide_min, unit="minute")
        v_m = pc.cast(pc.round(pc.multiply(t["value"], 1000.0)), pa.int64())
        parts = []
        for j in range(k):
            w = pc.subtract(base, pa.scalar(j * slide_min * 60_000_000,
                                            type=pa.duration("us")))
            parts.append(pa.table({"window_start": w,
                                   "event_type": t["event_type"],
                                   "value_m": v_m}))
        return pa.concat_tables(parts)

    out = (ds.map_batches(expand, batch_format="pyarrow")
           .groupby(["window_start", "event_type"])
           .aggregate(Count(alias_name="n"),
                      Sum("value_m", alias_name="sum_value_m")))
    return out.sort(["window_start", "event_type"])


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user: hash-partition by user, then ONE
    vectorized pass per partition handles every user in it (lexsort by
    (user, ts, event_id); session break = new user OR gap > threshold;
    sessions = cumsum of breaks; per-session rows via reduceat) — no
    per-group Python (Ray's map_groups runs one Python call per user)."""
    from centrality_gpu_ray.stages.shuffle import hash_partition_apply

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def sessionize_part(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "session_start": pa.array([], type=pa.timestamp("us")),
                "n_events": pa.array([], type=pa.int64()),
            })
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        ts = tbl.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts.view(np.int64), uid))
        uid_s, ts_s = uid[order], ts[order]
        t_int = ts_s.view(np.int64)
        brk = np.ones(uid_s.size, dtype=bool)
        brk[1:] = (uid_s[1:] != uid_s[:-1]) | \
            (t_int[1:] - t_int[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        counts = np.diff(np.r_[starts, uid_s.size])
        return pa.table({
            "user_id": pa.array(uid_s[starts].astype(np.int64)),
            "session_start": pa.array(ts_s[starts]),
            "n_events": pa.array(counts.astype(np.int64)),
        })

    out = hash_partition_apply(ds, ["user_id"], sessionize_part,
                               num_partitions=16)
    return out.sort(["user_id", "session_start"])


def lineitem_filter_project(sf_dir: str):
    """Filter + projection pushdown demo: returned high-value lines."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"])

    def f(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t["l_returnflag"], "R"),
                       pc.greater(t["l_extendedprice"], 45000.0))
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow") \
        .sort(["l_orderkey", "l_linenumber"])


def order_priority_histogram(sf_dir: str):
    """Two cascaded groupbys (the A3 histogram-of-counts pattern)."""
    from ray.data.aggregate import Count

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    per_cust = orders.groupby(["o_custkey", "o_orderpriority"]).aggregate(
        Count(alias_name="n"))
    hist = per_cust.groupby("n").aggregate(Count(alias_name="num_groups"))
    return hist.sort("n")


def supplier_nation_join(sf_dir: str):
    """3-way dimension join fully broadcast (all sides tiny)."""
    import ray
    from ray.data.aggregate import Count

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    dim_ref = ray.put(dim[["n_nationkey", "n_name", "r_name"]])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def join_batch(t: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dim_ref)
        return t.merge(d, left_on="s_nationkey", right_on="n_nationkey")[
            ["s_suppkey", "n_name", "r_name"]]

    out = supp.map_batches(join_batch, batch_format="pandas")
    return out.sort("s_suppkey")


def events_asof_orders(sf_dir: str):
    """As-of join: each event picks the latest order of the same
    customer at or before the event's timestamp (ties on o_orderdate
    broken by largest o_orderkey — deterministic, oracle-hashable).
    One co-partitioned exchange on the customer key, vectorized
    union-lexsort merge per partition (`stages/temporal.py`)."""
    from centrality_gpu_ray.stages.temporal import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    od = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = asof_join(ev, od, left_on="ts", right_on="o_orderdate",
                    left_by="user_id", right_by="o_custkey",
                    right_cols=["o_orderkey", "o_totalprice"],
                    tiebreak="o_orderkey", num_partitions=16)
    return out.sort("event_id")


def events_range_self(sf_dir: str, window_min: int = 60):
    """Range (interval) join, self-join flavor: every event matched to
    the SAME user's events in the preceding ``window_min`` minutes
    (inclusive both ends — each event matches at least itself), then
    aggregated per event: match count + milli-scaled value sum. The
    per-user rolling-activity feature every abuse / trending pipeline
    computes. One co-partitioned exchange on the user key + a
    vectorized searchsorted expansion
    (`stages/temporal.py::range_join`); the per-event aggregate runs
    per BLOCK (batch_size=None) — an event's matches never span
    partitions because the join partitions by its user, so no second
    shuffle is needed."""
    from centrality_gpu_ray.stages.temporal import range_join

    left = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    right = _read(sf_dir, "events", ["user_id", "ts", "value"])
    joined = range_join(left, right, left_on="ts", right_on="ts",
                        left_by="user_id", right_by="user_id",
                        right_cols=["value"],
                        before=window_min * 60 * 10**6, after=0,
                        num_partitions=16)

    def agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_id": pa.chunked_array([[]], pa.int64()),
                             "n_win": pa.chunked_array([[]], pa.int64()),
                             "sum_value_m": pa.chunked_array([[]], pa.int64())})
        v_m = pc.cast(pc.round(pc.multiply(t["value"], 1000.0)), pa.int64())
        g = (pa.table({"event_id": t["event_id"], "value_m": v_m})
             .group_by("event_id")
             .aggregate([([], "count_all"), ("value_m", "sum")]))
        return pa.table({"event_id": g["event_id"],
                         "n_win": pc.cast(g["count_all"], pa.int64()),
                         "sum_value_m": g["value_m_sum"]})

    out = joined.map_batches(agg, batch_size=None, batch_format="pyarrow")
    return out.sort("event_id")
