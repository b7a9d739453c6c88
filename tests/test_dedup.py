"""Dedup family: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding."""

import os
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.functions.dedup import (
    MinHasher, embedding_near_dup, exact_dedup, lsh_candidate_pairs,
    minhash_dedup, minhash_signatures, ngram_jaccard_pairs, simhash_dedup,
    simhash_signatures)

BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest while the sun sets slowly behind hills ")


def _doc_table():
    """10 docs: 0≡1 exact dup; 2≈3 near-dup (one word changed); 4≈0 near
    (two words changed); 5-9 distinct."""
    docs = [
        BASE * 3,
        BASE * 3,
        BASE * 3 + "extra tail words here",
        (BASE * 3 + "extra tail words here").replace("quick", "rapid", 1),
        (BASE * 3).replace("lazy", "sleepy").replace("sun", "moon"),
        "completely different text about graph engines and ray data pipelines",
        "another unrelated document discussing arrow record batches at scale",
        "short one",
        "yet another independent piece of text with its own distinct words",
        "final document mentioning parquet files and shuffle strategies",
    ]
    return pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "text": pa.array(docs),
    })


@pytest.fixture(scope="module")
def docs_ds():
    return ray.data.from_arrow(_doc_table())


def test_exact_dedup(docs_ds):
    out = exact_dedup(docs_ds).to_pandas().sort_values("doc_id")
    assert 0 in out["doc_id"].values and 1 not in out["doc_id"].values
    assert len(out) == 9


def test_minhash_signature_similarity_tracks_jaccard():
    mh = MinHasher(num_perm=128)
    s1 = mh.signature(BASE * 3)
    s2 = mh.signature((BASE * 3).replace("lazy", "sleepy"))
    s3 = mh.signature("completely different text entirely unrelated")
    near = (s1 == s2).mean()
    far = (s1 == s3).mean()
    assert near > 0.7
    assert far < 0.2


def test_lsh_finds_near_dups(docs_ds):
    sigs = minhash_signatures(docs_ds)
    pairs = lsh_candidate_pairs(sigs).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values.tolist()))
    assert (0, 1) in got
    assert (2, 3) in got


def test_ngram_jaccard_verify(docs_ds):
    pairs = ray.data.from_arrow(pa.table({
        "a": pa.array([0, 0], type=pa.int64()),
        "b": pa.array([1, 5], type=pa.int64()),
    }))
    out = ngram_jaccard_pairs(docs_ds, pairs).to_pandas().sort_values("b")
    assert out.iloc[0]["jaccard"] == pytest.approx(1.0)
    assert out.iloc[1]["jaccard"] < 0.05


def test_minhash_dedup_end_to_end(docs_ds):
    out = minhash_dedup(docs_ds, threshold=0.5).to_pandas().sort_values("doc_id")
    assert len(out) == 10
    # 0,1,4 cluster together (0≡1, 4 near 0); 2,3 cluster; keepers are min ids
    assert out.loc[out.doc_id == 1, "cluster"].iloc[0] == 0
    assert out.loc[out.doc_id == 3, "cluster"].iloc[0] == \
        out.loc[out.doc_id == 2, "cluster"].iloc[0]
    assert bool(out.loc[out.doc_id == 0, "keep"].iloc[0])
    assert not bool(out.loc[out.doc_id == 1, "keep"].iloc[0])
    # distinct docs survive alone
    for d in (5, 6, 7, 8, 9):
        assert bool(out.loc[out.doc_id == d, "keep"].iloc[0])


def test_simhash_near_dups(docs_ds):
    sigs = simhash_signatures(docs_ds).to_pandas().sort_values("doc_id")
    h = sigs["simhash"].to_numpy().view(np.uint64)
    assert h[0] == h[1]  # identical docs → identical simhash
    pairs = simhash_dedup(docs_ds, max_hamming=3).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values.tolist()))
    assert (0, 1) in got
    assert all(a != b for a, b in got)


def test_embedding_near_dup():
    rng = np.random.default_rng(3)
    M = rng.standard_normal((50, 16))
    M[7] = M[3] + 0.01 * rng.standard_normal(16)  # planted near-dup
    t = pa.table({
        "vec_id": pa.array(np.arange(50, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in M],
                              type=pa.list_(pa.float32())),
    })
    out = embedding_near_dup(ray.data.from_arrow(t), threshold=0.99).to_pandas()
    assert {(3, 7)} == set(map(tuple, out[["a", "b"]].values.tolist()))


def _para_dedup_oracle_sql(table_expr):
    return rf"""
        WITH paras AS (
          SELECT doc_id, u.p AS para, u.i AS idx FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       string_split(COALESCE(text, ''), chr(10)),
                       (x, i) -> struct_pack(p := x, i := i))) AS u
            FROM {table_expr})),
        marked AS (
          SELECT doc_id, para, idx,
                 doc_id * 1048576 + (idx - 1) AS pos,
                 MIN(doc_id * 1048576 + (idx - 1))
                     OVER (PARTITION BY para) AS wpos
          FROM paras)
        SELECT doc_id, STRING_AGG(para, chr(10) ORDER BY idx) AS text
        FROM marked WHERE pos = wpos GROUP BY doc_id ORDER BY doc_id"""


def test_remove_repeated_paragraphs_planted():
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from centrality_gpu_ray.functions.dedup import remove_repeated_paragraphs

    boiler = "SUBSCRIBE TO OUR NEWSLETTER"
    df = pd.DataFrame({
        "doc_id": [3, 7, 9, 12],
        "text": [
            f"alpha one\n{boiler}\nalpha two",
            f"{boiler}\nbeta only",
            f"gamma\ngamma\n{boiler}",       # intra-doc repeat too
            boiler,                            # fully-removed doc drops
        ],
    })
    con = duckdb.connect()
    con.register("pd_docs", df)
    want = con.execute(_para_dedup_oracle_sql("pd_docs")).fetchdf()
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    got = remove_repeated_paragraphs(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # semantics spot-checks
    t = dict(zip(got["doc_id"], got["text"]))
    assert t[3] == f"alpha one\n{boiler}\nalpha two"  # first occurrence kept
    assert t[7] == "beta only"
    assert t[9] == "gamma"
    assert 12 not in t  # every span removed -> doc dropped


def test_remove_repeated_paragraphs_documents_table():
    import duckdb
    import pandas as pd
    import ray.data

    from centrality_gpu_ray.functions.dedup import remove_repeated_paragraphs

    sf = "/root/testdata/sf0.01"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "text"])
    got = remove_repeated_paragraphs(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = duckdb.execute(_para_dedup_oracle_sql(
        f"read_parquet('{sf}/documents.parquet')")).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# remove_repeated_spans — ExactSubstr shape (Lee et al. 2022)
# ---------------------------------------------------------------------------

def _spans_reference(df, n, min_count=2):
    """Serial oracle: remove every token covered by an n-gram occurring
    >= min_count times corpus-wide (all occurrences)."""
    from collections import Counter
    toks = {i: t.split() for i, t in zip(df["doc_id"], df["text"])}
    cnt = Counter()
    for tk in toks.values():
        for j in range(len(tk) - n + 1):
            cnt[" ".join(tk[j:j + n])] += 1
    dup = {g for g, c in cnt.items() if c >= min_count}
    out = []
    for i, t in zip(df["doc_id"], df["text"]):
        tk = toks[i]
        cov = [False] * len(tk)
        for j in range(len(tk) - n + 1):
            if " ".join(tk[j:j + n]) in dup:
                for p in range(j, j + n):
                    cov[p] = True
        if not any(cov):
            out.append((i, t, 0))          # untouched: original text
        else:
            kept = [w for w, c in zip(tk, cov) if not c]
            if kept:
                out.append((i, " ".join(kept), sum(cov)))
    return pd.DataFrame(out, columns=["doc_id", "text", "n_removed"])


def _spans_run(df, n, **kw):
    from centrality_gpu_ray.functions.dedup import remove_repeated_spans
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    return (remove_repeated_spans(ds, n=n, num_partitions=4, **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_remove_repeated_spans_planted():
    boiler = "click here to subscribe to our free weekly newsletter today"
    df = pd.DataFrame({
        "doc_id": np.array([3, 7, 9, 12, 15], dtype=np.int64),
        "text": [
            f"alpha one two three {boiler} tail words here",
            f"{boiler} beta gamma delta epsilon zeta",
            # within-doc repeat alone crosses min_count
            "x1 x2 unique run of tokens x1 x2 unique run of tokens done",
            boiler,                                  # fully covered: drops
            "totally  distinct   text with    odd whitespace preserved",
        ],
    })
    want = _spans_reference(df, n=5)
    for kw in ({}, {"force_distributed": True}):
        got = _spans_run(df, n=5, **kw)
        pd.testing.assert_frame_equal(
            got, want.reset_index(drop=True), check_dtype=False)
    t = dict(zip(got["doc_id"], got["text"]))
    assert 12 not in t                       # fully-covered doc dropped
    assert t[15] == df["text"][4]            # untouched: whitespace intact
    assert boiler.split()[0] not in t[3]     # boilerplate gone
    assert t[3].startswith("alpha one two three")


def test_remove_repeated_spans_random_vs_reference():
    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i}" for i in range(30)])
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 40)))
             for _ in range(60)]
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": texts})
    want = _spans_reference(df, n=3)
    got_b = _spans_run(df, n=3)
    got_d = _spans_run(df, n=3, force_distributed=True)
    pd.testing.assert_frame_equal(got_b, want, check_dtype=False)
    pd.testing.assert_frame_equal(got_d, want, check_dtype=False)


def test_remove_repeated_spans_no_duplicates_passthrough():
    df = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["entirely unique words in this document",
                 "and a second one sharing no five gram"],
    })
    got = _spans_run(df, n=5)
    assert got["n_removed"].tolist() == [0, 0]
    assert got["text"].tolist() == df["text"].tolist()


def _span_dedup_oracle_sql(src: str, n: int) -> str:
    """Independent ANSI-SQL restatement of remove_repeated_spans:
    windowed n-gram via LEAD, duplicated set by HAVING count>=2,
    coverage by a range join on window starts, CASE-preserved original
    text for untouched docs."""
    leads = " || ' ' || ".join(
        ["tok"] + [f"LEAD(tok, {j}) OVER w" for j in range(1, n)])
    return f"""
        WITH toks AS (
          SELECT doc_id, UNNEST(l) AS tok,
                 GENERATE_SUBSCRIPTS(l, 1) AS ord
          FROM (SELECT doc_id,
                       STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS l
                FROM {src} WHERE LENGTH(TRIM(text)) > 0)),
        grams AS MATERIALIZED (
          SELECT doc_id, ord AS start, {leads} AS gram,
                 LEAD(tok, {n - 1}) OVER w AS last_tok
          FROM toks
          WINDOW w AS (PARTITION BY doc_id ORDER BY ord)),
        dup AS MATERIALIZED (
          SELECT gram FROM grams WHERE last_tok IS NOT NULL
          GROUP BY gram HAVING COUNT(*) >= 2),
        cov AS (
          SELECT t.doc_id, t.ord, t.tok,
                 EXISTS (SELECT 1 FROM grams g
                         WHERE g.doc_id = t.doc_id
                           AND g.start BETWEEN t.ord - {n - 1} AND t.ord
                           AND g.last_tok IS NOT NULL
                           AND g.gram IN (SELECT gram FROM dup))
                   AS covered
          FROM toks t),
        agg AS (
          SELECT doc_id,
                 STRING_AGG(tok, ' ' ORDER BY ord)
                   FILTER (WHERE NOT covered) AS rebuilt,
                 COUNT(*) FILTER (WHERE covered) AS n_removed
          FROM cov GROUP BY doc_id)
        SELECT d.doc_id,
               CASE WHEN a.n_removed = 0 THEN d.text
                    ELSE a.rebuilt END AS text,
               a.n_removed
        FROM {src} d JOIN agg a USING (doc_id)
        WHERE a.n_removed = 0 OR a.rebuilt IS NOT NULL
        ORDER BY d.doc_id"""


def test_remove_repeated_spans_duckdb_oracle():
    import duckdb

    boiler = "click here to subscribe to our free weekly newsletter today"
    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(25)])
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 30)))
             for _ in range(40)]
    texts += [f"head {boiler} tail{i}" for i in range(3)]
    texts += [boiler]                     # fully covered at n<=10: drops
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    con = duckdb.connect()
    con.register("pd_docs", df)
    for n in (3, 5):
        want = con.execute(_span_dedup_oracle_sql("pd_docs", n)).fetchdf()
        got = _spans_run(df, n=n)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_remove_repeated_spans_documents_table():
    from centrality_gpu_ray.functions.dedup import remove_repeated_spans
    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "text"])
    df = docs.to_pandas()
    want = _spans_reference(df, n=8).sort_values("doc_id") \
        .reset_index(drop=True)
    got = remove_repeated_spans(docs, n=8, num_partitions=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_removed"] > 0).any()      # synthetic docs share spans


# ---------------------------------------------------------------------------
# exact_dedup_incremental — cross-run dedup with persisted hash state
# ---------------------------------------------------------------------------

def test_exact_dedup_incremental_runs(tmp_path):
    from centrality_gpu_ray.functions.dedup import exact_dedup_incremental

    state = str(tmp_path / "dedup_state")

    def mk(ids, texts):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.array(ids, np.int64)),
            "text": pa.array(texts)})).repartition(2)

    # run 0: internal dup (1,2 same text) -> min-id winner kept
    s0, d0 = exact_dedup_incremental(
        mk([1, 2, 3], ["aaa", "aaa", "bbb"]), state, num_partitions=4)
    df0 = s0.to_pandas().sort_values("doc_id")
    assert df0["doc_id"].tolist() == [1, 3]
    assert d0.endswith("run=0")

    # run 1: "aaa"/"bbb" already seen -> dropped; "ccc" new (dup within
    # run -> min id 11); "bbb" reappearing under a new id also drops
    s1, d1 = exact_dedup_incremental(
        mk([10, 11, 12, 13], ["bbb", "ccc", "ccc", "aaa"]), state,
        num_partitions=4)
    df1 = s1.to_pandas()
    assert df1["doc_id"].tolist() == [11]
    assert d1.endswith("run=1")

    # run 2: replaying run 1's input against the grown state -> empty
    s2, _ = exact_dedup_incremental(
        mk([20, 21], ["ccc", "bbb"]), state, num_partitions=4)
    assert s2.count() == 0

    # state grew append-only: run dirs 0..2 all present
    import glob
    assert len(glob.glob(f"{state}/run=*")) == 3

def test_exact_dedup_incremental_crash_safe(tmp_path):
    """A crashed run's partial staging files must never poison the seen
    set: hashes land in _tmp_run_* first and only an atomic rename
    publishes run=<k>. A stale tmp dir from a dead run is ignored and a
    retry reprocesses those docs instead of silently dropping them."""
    import glob

    import pyarrow.parquet as pq

    from centrality_gpu_ray.functions.dedup import exact_dedup_incremental

    state = str(tmp_path / "dedup_state")

    def mk(ids, texts):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.array(ids, np.int64)),
            "text": pa.array(texts)})).repartition(2)

    s0, d0 = exact_dedup_incremental(mk([1], ["aaa"]), state,
                                     num_partitions=4)
    assert s0.to_pandas()["doc_id"].tolist() == [1]

    # simulate a crash: a partial staging dir holding "bbb"'s hash
    # (what a mid-write death leaves behind)
    stale = os.path.join(state, "_tmp_run_dead")
    os.makedirs(stale)
    txt = np.asarray(["bbb"], dtype=object)
    h = pd.util.hash_array(txt).view(np.int64)
    pq.write_table(pa.table({"_h": pa.array(h)}),
                   os.path.join(stale, "part.parquet"))

    # the retry must still return "bbb" as a survivor (the stale tmp
    # hash is NOT seen state) and claim run=1, skipping the tmp dir
    s1, d1 = exact_dedup_incremental(mk([2, 3], ["bbb", "aaa"]), state,
                                     num_partitions=4)
    assert s1.to_pandas()["doc_id"].tolist() == [2]
    assert d1.endswith("run=1")
    assert sorted(os.path.basename(p) for p in
                  glob.glob(f"{state}/run=*")) == ["run=0", "run=1"]

    # non-contiguous surviving indices: numbering continues past a gap
    os.rename(os.path.join(state, "run=1"), os.path.join(state, "run=7"))
    s2, d2 = exact_dedup_incremental(mk([4], ["ddd"]), state,
                                     num_partitions=4)
    assert s2.to_pandas()["doc_id"].tolist() == [4]
    assert d2.endswith("run=8")


# ---------------------------------------------------------------------------
# quality-aware exact dedup
# ---------------------------------------------------------------------------

def test_exact_dedup_best_matches_duckdb_window(ray_session):
    """Best-score winner per distinct text == SQL ROW_NUMBER oracle."""
    import duckdb

    from centrality_gpu_ray.functions.dedup import exact_dedup_best

    rng = np.random.default_rng(17)
    texts = [f"doc body variant {i % 7}" for i in range(40)]
    tbl = pa.table({
        "doc_id": pa.array(range(200, 240), type=pa.int64()),
        "text": pa.array(texts),
        "quality": pa.array(np.round(rng.random(40), 3)),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = sorted(exact_dedup_best(ds, score_col="quality")
                 .to_pandas()["doc_id"].tolist())
    con = duckdb.connect()
    con.register("docs", tbl.to_pandas())
    want = sorted(con.sql("""
        SELECT doc_id FROM (
            SELECT doc_id, ROW_NUMBER() OVER (
                PARTITION BY text
                ORDER BY quality DESC, doc_id) AS rn
            FROM docs) WHERE rn = 1""").df()["doc_id"].tolist())
    assert got == want
    assert len(got) == 7


def test_exact_dedup_best_ties_and_nan(ray_session):
    from centrality_gpu_ray.functions.dedup import exact_dedup_best

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "text": pa.array(["a", "a", "a", "b", "b", "c"]),
        "quality": pa.array([0.5, 0.9, 0.9, float("nan"), 0.1,
                             float("nan")]),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = sorted(exact_dedup_best(ds, score_col="quality")
                 .to_pandas()["doc_id"].tolist())
    # "a": 0.9 tie -> min id 2; "b": NaN loses to 0.1 -> id 5;
    # "c": all-NaN group -> min id 6
    assert got == [2, 5, 6]


def test_exact_dedup_best_schema_preserved(ray_session):
    from centrality_gpu_ray.functions.dedup import exact_dedup_best

    tbl = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["x", "x"]),
        "quality": pa.array([0.1, 0.7]),
        "lang": pa.array(["en", "de"]),
    })
    out = exact_dedup_best(ray.data.from_arrow(tbl),
                           score_col="quality").to_pandas()
    assert list(out.columns) == ["doc_id", "text", "quality", "lang"]
    assert out.doc_id.tolist() == [2] and out.lang.tolist() == ["de"]
