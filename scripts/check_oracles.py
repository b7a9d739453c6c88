"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare against ``oracle_sql()`` via
DuckDB — row count, schema, and order-insensitive exact values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df):
    import pandas as pd

    # Mirror the driver's hash semantics: dtypes matter.  Only timestamps
    # are unit-normalised (Arrow->pandas yields ns, DuckDB us); integer
    # widths are NOT coerced, so a DuckDB HUGEINT (int128 -> object/float)
    # vs engine int64 shows up here exactly as it does in the driver hash.
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            raw = to_pandas(fn(sf_dir))
            if name not in oracles:
                # rows-only: no canon (list-typed columns aren't sortable)
                results[name] = {"status": "rows_only", "rows": len(raw),
                                 "sec": round(time.perf_counter() - t0, 2)}
                continue
            got = canon(raw)
            elapsed = time.perf_counter() - t0
            want = canon(con.sql(oracles[name]).df())
            status = "ok"
            detail = ""
            if list(got.columns) != list(want.columns):
                status, detail = "SCHEMA_MISMATCH", f"{list(got.columns)} vs {list(want.columns)}"
            elif len(got) != len(want):
                status, detail = "ROWCOUNT_MISMATCH", f"{len(got)} vs {len(want)}"
            else:
                import pandas as pd

                try:
                    pd.testing.assert_frame_equal(got, want, check_dtype=True,
                                                  check_exact=True)
                except AssertionError as e:
                    status, detail = "VALUE_MISMATCH", str(e).split("\n")[0]
            results[name] = {"status": status, "rows": len(got),
                             "sec": round(elapsed, 2), **({"detail": detail} if detail else {})}
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ERROR", "error": f"{type(e).__name__}: {e}"[:300]}
        print(f"{name}: {results[name]}", flush=True)

    bad = {k: v for k, v in results.items()
           if v["status"] not in ("ok", "rows_only")}
    print(json.dumps({"total": len(results), "failed": len(bad)}))
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
