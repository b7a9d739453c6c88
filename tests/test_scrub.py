"""PII scrub + normalization vs identical-semantics DuckDB oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from centrality_gpu_ray.functions.scrub import (
    normalize_text, scrub_oracle_sql, scrub_pii)

SF = "/root/testdata/sf0.01"

_PII_DOCS = pd.DataFrame({
    "doc_id": np.arange(8, dtype=np.int64),
    "text": [
        "reach me at jane.doe+spam@example.co.uk or call +4915123456789",
        "server 192.168.0.1 and 10.0.0.255 are down; email ops@corp.io",
        "call 555-123-4567 today, or 555 987 6543 tomorrow",
        "no pii here, just text with   runs\tof\nwhitespace  ",
        "two mails: a@b.org c.d@e-f.museum and ip 8.8.8.8",
        "",
        None,
        "edge@case.x not-an-email @nope 1.2.3 12345678 +123456",
    ],
})


def _ray_scrub_df(df):
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    out = scrub_pii(ds).to_pandas().sort_values("doc_id")
    return out.reset_index(drop=True)


def test_scrub_matches_duckdb_oracle_on_planted_pii():
    con = duckdb.connect()
    con.register("pii_docs", _PII_DOCS)
    want = con.execute(scrub_oracle_sql("pii_docs")).fetchdf()
    got = _ray_scrub_df(_PII_DOCS)
    got = got[want.columns.tolist()]
    pd.testing.assert_frame_equal(
        got, want.reset_index(drop=True), check_dtype=False)
    # sanity on the semantics themselves
    row0 = got.loc[0, "text"]
    assert "<EMAIL>" in row0 and "<PHONE>" in row0
    assert "example.co.uk" not in row0
    assert got.loc[1, "n_ipv4"] == 2 and got.loc[1, "n_email"] == 1


def test_scrub_matches_duckdb_oracle_on_documents_table():
    path = f"{SF}/documents.parquet"
    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    got = scrub_pii(docs).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    want = duckdb.execute(
        scrub_oracle_sql(f"read_parquet('{path}')")).fetchdf()
    got = got[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_normalize_matches_duckdb():
    con = duckdb.connect()
    con.register("pii_docs", _PII_DOCS)
    want = con.execute(r"""
        SELECT doc_id,
               TRIM(regexp_replace(
                   nfc_normalize(COALESCE(text, '')),
                   '[ \t\r\n\f\v]+', ' ', 'g')) AS text
        FROM pii_docs ORDER BY doc_id""").fetchdf()
    ds = ray.data.from_arrow(pa.Table.from_pandas(_PII_DOCS))
    got = normalize_text(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "text"]], want, check_dtype=False)
    assert got.loc[3, "text"] == "no pii here, just text with runs of whitespace"


def test_normalize_lowercase_and_stream_shape():
    ds = ray.data.from_arrow(pa.Table.from_pandas(_PII_DOCS))
    got = normalize_text(ds, lowercase=True).to_pandas()
    assert (got["text"].str.lower() == got["text"]).all()
    # partitioning invariance (pure map stage)
    got2 = normalize_text(
        ray.data.from_arrow(pa.Table.from_pandas(_PII_DOCS)).repartition(5),
        lowercase=True).to_pandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = got2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
