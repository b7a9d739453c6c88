"""Repetition statistics vs an independent DuckDB derivation (exact
string grouping — would also catch a 64-bit line/gram hash collision
in the engine's run-length counting)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from centrality_gpu_ray.functions.repetition import (repetition_filter,
                                                     repetition_stats)

_ORACLE_SQL = r"""
WITH lines0 AS (
  SELECT doc_id, trim(l, ' ' || chr(9) || chr(13)) AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
        FROM docs)
), lines AS (SELECT * FROM lines0 WHERE line <> ''),
lc AS (SELECT doc_id, line, count(*) AS c, length(line) AS len
       FROM lines GROUP BY 1, 2),
la AS (SELECT doc_id, sum(c) AS nl, sum(c) - count(*) AS dups,
              sum((c - 1) * len) AS dupchars, sum(c * len) AS allchars
       FROM lc GROUP BY 1),
words AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM docs
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS g
  FROM words WHERE len(ws) >= 2
), gc AS (SELECT doc_id, g, count(*) AS c, length(g) AS glen
          FROM grams GROUP BY 1, 2),
gm AS (SELECT doc_id, max(c) AS mc FROM gc GROUP BY 1),
gl AS (SELECT gc.doc_id, gm.mc, max(gc.glen) AS ml
       FROM gc JOIN gm ON gc.doc_id = gm.doc_id AND gc.c = gm.mc
       GROUP BY 1, 2),
jl AS (SELECT doc_id, length(array_to_string(ws, ' ')) AS jlen
       FROM words WHERE len(ws) >= 2)
SELECT d.doc_id,
       coalesce(la.nl, 0)::BIGINT AS n_lines,
       CASE WHEN coalesce(la.nl, 0) > 0
            THEN la.dups::DOUBLE / la.nl ELSE 0 END AS dup_line_frac,
       CASE WHEN coalesce(la.allchars, 0) > 0
            THEN la.dupchars::DOUBLE / la.allchars
            ELSE 0 END AS dup_line_char_frac,
       CASE WHEN jl.jlen > 0
            THEN gl.mc::DOUBLE * gl.ml / jl.jlen
            ELSE 0 END AS top2gram_char_frac
FROM (SELECT DISTINCT doc_id FROM docs) d
LEFT JOIN la USING (doc_id)
LEFT JOIN gl USING (doc_id)
LEFT JOIN jl USING (doc_id)
ORDER BY doc_id
"""


def _docs_frame():
    rng = np.random.default_rng(41)
    rows = []
    vocab = [f"w{i}" for i in range(12)] + ["longword" * 3, "x"]
    for i in range(160):
        nl = int(rng.integers(0, 6))
        ls = []
        for _ in range(nl):
            nw = int(rng.integers(0, 9))
            ls.append(" ".join(rng.choice(vocab, nw)))
        if rng.random() < 0.5 and ls:      # force duplicate lines
            ls += list(rng.choice(ls, int(rng.integers(1, 3))))
        txt = "\n".join(ls)
        if rng.random() < 0.3:             # trailing/odd whitespace
            txt = "  " + txt + "\t\n\n  \n"
        rows.append((i, txt))
    rows += [
        (1000, ""), (1001, "   \n \t \n"),
        (1002, "a b a b a b a b"),          # heavy 2-gram repetition
        (1003, "same line\nsame line\nsame line\nother"),
        (1004, "one"),                      # single word, single line
        (1005, "aa bb\naa bb"),             # dup lines AND dup grams
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_repetition_stats_matches_duckdb():
    import ray.data

    docs = _docs_frame()
    got = repetition_stats(
        ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", docs)
    want = con.execute(_ORACLE_SQL).df()
    assert list(got["doc_id"]) == list(want["doc_id"])
    for col in ("n_lines",):
        np.testing.assert_array_equal(got[col].to_numpy(),
                                      want[col].to_numpy(), err_msg=col)
    for col in ("dup_line_frac", "dup_line_char_frac",
                "top2gram_char_frac"):
        np.testing.assert_allclose(got[col].to_numpy(),
                                   want[col].to_numpy(),
                                   rtol=1e-12, atol=1e-12, err_msg=col)


def test_repetition_known_values():
    import ray.data

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b a b a b",            # top pair "a b" x3, join 11
                 "x\nx\nyy",               # 3 lines, 1 dup
                 "u v w"],
    })
    got = repetition_stats(ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_allclose(got["top2gram_char_frac"][0], 9 / 11)
    np.testing.assert_allclose(got["dup_line_frac"][1], 1 / 3)
    np.testing.assert_allclose(got["dup_line_char_frac"][1], 1 / 4)
    np.testing.assert_allclose(got["top2gram_char_frac"][2], 3 / 5)


def test_repetition_filter_thresholds():
    import ray.data

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["spam spam spam spam spam",       # dominated by 1 pair
                 "a perfectly normal sentence here"],
    })
    kept = repetition_filter(ray.data.from_pandas(docs),
                             max_top2gram_char_frac=0.5) \
        .to_pandas()["doc_id"].tolist()
    assert kept == [2]
    # generous thresholds keep everything (the count*len 2-gram form
    # exceeds 1 on overlapping repeats — "spam spam spam spam spam"
    # scores 4*9/24 = 1.5 by construction)
    kept = repetition_filter(ray.data.from_pandas(docs),
                             max_dup_line_frac=1.0,
                             max_dup_line_char_frac=1.0,
                             max_top2gram_char_frac=2.0) \
        .to_pandas()["doc_id"].tolist()
    assert sorted(kept) == [1, 2]


def test_repetition_partitioning_invariance():
    import ray.data

    docs = _docs_frame()
    one = repetition_stats(
        ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    many = repetition_stats(
        ray.data.from_pandas(docs).repartition(7)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)
