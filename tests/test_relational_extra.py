"""DuckDB parity for relational queries that rotated OUT of the
50-row driver gate but stay first-class library operators."""
import duckdb

from centrality_gpu_ray import relational as rel

SF = "/root/testdata/sf0.001"

_MKTSEG_SQL = f"""
    SELECT c_mktsegment,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_revenue_c,
           CAST(COUNT(*) AS BIGINT) AS num_orders
    FROM read_parquet('{SF}/orders.parquet') o
    JOIN read_parquet('{SF}/customer.parquet') c ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY 1"""


def test_revenue_by_mktsegment_matches_duckdb(ray_session):
    got = rel.revenue_by_mktsegment(SF).to_pandas()
    want = duckdb.sql(_MKTSEG_SQL).df()
    got = got.sort_values("c_mktsegment").reset_index(drop=True)
    assert list(got["c_mktsegment"]) == list(want["c_mktsegment"])
    assert list(got["total_revenue_c"]) == list(want["total_revenue_c"])
    assert list(got["num_orders"]) == list(want["num_orders"])
