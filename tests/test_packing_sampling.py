"""Sequence packing (concat-and-chunk layout) + deterministic
corpus-mixture sampling — pandas/hashlib oracles, partitioning
invariance, edge cases."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.functions.packing import (
    chunk_fill_stats, pack_sequences)
from centrality_gpu_ray.functions.sampling import (
    mixture_sample, rate_threshold_hex)

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])


def _pack_oracle(df: pd.DataFrame, C: int) -> pd.DataFrame:
    """Driver-side pandas re-derivation of the packing layout."""
    n = (df["text"].fillna("").str.strip()
         .map(lambda t: len(t.split()) if t else 0))
    o = pd.DataFrame({"doc_id": df["doc_id"], "n_tokens": n})
    o = o[o.n_tokens > 0].sort_values("doc_id").reset_index(drop=True)
    o["start_token"] = o["n_tokens"].cumsum() - o["n_tokens"]
    o["first_chunk"] = o["start_token"] // C
    o["last_chunk"] = (o["start_token"] + o["n_tokens"] - 1) // C
    o["n_chunks"] = o["last_chunk"] - o["first_chunk"] + 1
    return o


def test_pack_sequences_matches_pandas_oracle():
    C = 64
    out = pack_sequences(_docs(), context_len=C).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    oracle = _pack_oracle(_docs().to_pandas(), C)
    pd.testing.assert_frame_equal(
        out.astype("int64"), oracle.astype("int64"))


def test_pack_sequences_partitioning_invariant():
    C = 32
    base = pack_sequences(_docs(), context_len=C).to_pandas()
    many = pack_sequences(_docs().repartition(13),
                          context_len=C).to_pandas()
    a = base.sort_values("doc_id").reset_index(drop=True)
    b = many.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_sequences_drops_empty_docs_and_validates():
    t = pa.table({
        "doc_id": pa.array([5, 6, 7, 8], type=pa.int64()),
        "text": pa.array(["one two three", "", None, "four five"]),
    })
    out = pack_sequences(ray.data.from_arrow(t),
                         context_len=4).to_pandas()
    assert out["doc_id"].tolist() == [5, 8]
    assert out["start_token"].tolist() == [0, 3]
    # doc 8 spans tokens [3, 5) → chunk 0 only (C=4 → last token 4 in chunk 1)
    assert out["first_chunk"].tolist() == [0, 0]
    assert out["last_chunk"].tolist() == [0, 1]
    with pytest.raises(ValueError):
        pack_sequences(ray.data.from_arrow(t), context_len=0)


def test_chunk_fill_stats_totals():
    C = 64
    packed = pack_sequences(_docs(), context_len=C)
    pdf = packed.to_pandas()
    stats = chunk_fill_stats(packed, context_len=C).to_pandas()
    stats = stats.sort_values("chunk").reset_index(drop=True)
    # every (doc, chunk) incidence is counted exactly once
    assert stats["count"].sum() == pdf["n_chunks"].sum()
    # chunk ids form the exact contiguous range of the stream
    total_tokens = int(pdf["n_tokens"].sum())
    assert stats["chunk"].tolist() == list(
        range((total_tokens + C - 1) // C))
    # straddler incidences: each multi-chunk doc contributes n_chunks
    multi = pdf[pdf.n_chunks > 1]
    assert stats["straddlers"].sum() == multi["n_chunks"].sum()


def _sample_oracle(langs: pd.DataFrame, rates, default=1.0):
    th = {k: rate_threshold_hex(v) for k, v in rates.items()}
    dflt = rate_threshold_hex(default)
    keep = [
        hashlib.sha256(str(int(i)).encode()).hexdigest()[:16]
        < th.get(l, dflt)
        for i, l in zip(langs["doc_id"], langs["pred_lang"])]
    return langs.loc[keep]


def test_mixture_sample_matches_hashlib_oracle():
    from centrality_gpu_ray.functions.text import language_id

    rates = {"en": 1.0, "de": 0.5, "es": 0.5, "fr": 0.5,
             "it": 0.5, "pt": 0.5, "und": 0.25}
    out = mixture_sample(_docs(), rates).to_pandas()
    langs = language_id(_docs()).to_pandas()[["doc_id", "pred_lang"]]
    oracle = _sample_oracle(langs, rates)
    assert sorted(out["doc_id"]) == sorted(oracle["doc_id"])
    # en rate 1.0 → every en doc survives
    n_en = (langs.pred_lang == "en").sum()
    assert (out.pred_lang == "en").sum() == n_en
    # downsampled languages lose a nontrivial fraction
    n_other = (langs.pred_lang != "en").sum()
    kept_other = (out.pred_lang != "en").sum()
    assert 0 < kept_other < n_other


def test_mixture_sample_partitioning_invariant_and_zero_rate():
    rates = {"en": 0.0, "und": 0.3}
    a = mixture_sample(_docs(), rates, default_rate=0.3).to_pandas()
    b = mixture_sample(_docs().repartition(7), rates,
                       default_rate=0.3).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert (a.pred_lang != "en").all()  # rate 0 keeps none


def test_rate_threshold_hex_edges():
    assert rate_threshold_hex(1.0) == "g"
    assert rate_threshold_hex(0.0) == ""
    assert rate_threshold_hex(0.5) == "8000000000000000"
    # monotone in rate
    hs = [rate_threshold_hex(r) for r in np.linspace(0.01, 0.99, 20)]
    assert hs == sorted(hs)


def test_stratified_sample_matches_duckdb_rownumber():
    import duckdb

    from centrality_gpu_ray.functions.sampling import stratified_sample

    k = 7
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "lang"])
    out = stratified_sample(docs, "lang", k=k,
                            num_partitions=8).to_pandas()
    oracle = duckdb.execute(f"""
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY lang
                     ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id)
                 AS rn
          FROM read_parquet('{SF}/documents.parquet')) WHERE rn <= {k}
        """).fetch_df()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = oracle.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["doc_id", "lang"]],
                                  b[["doc_id", "lang"]])
    # exactly min(k, |stratum|) per stratum
    full = docs.to_pandas()["lang"].value_counts()
    got = out["lang"].value_counts()
    for lang, n in full.items():
        assert got.get(lang, 0) == min(k, n), lang


def test_stratified_sample_partitioning_invariant():
    from centrality_gpu_ray.functions.sampling import stratified_sample

    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "lang"])
    a = stratified_sample(docs, "lang", k=5,
                          num_partitions=4).to_pandas()
    b = stratified_sample(docs.repartition(9), "lang", k=5,
                          num_partitions=16).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    with pytest.raises(ValueError):
        stratified_sample(docs, "lang", k=0)
