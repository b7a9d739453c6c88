"""Corpus → sha256 ingest → edge derivation → flagship pipeline, plus
checkpoint/resume (FIXTURES.md §4 oracle strategy rows 3-4)."""

import numpy as np
import pytest

from centrality_gpu_ray.config import EngineConfig
from centrality_gpu_ray.pipelines import Graph, connected_components, pagerank, triangle_counts
from centrality_gpu_ray.sources.corpus import corpus_dataset, generate_corpus_table
from centrality_gpu_ray.stages.edges import derive_corpus_edges, derive_corpus_nodes
from centrality_gpu_ray.stages.ingest import sha256_oracle, with_content_sha256


def test_corpus_deterministic():
    a = generate_corpus_table(num_rows=500, seed=42)
    b = generate_corpus_table(num_rows=500, seed=42)
    assert a.equals(b)
    assert a.column_names == ["repo", "path", "commit", "lang", "content"]


def test_sha256_invariant():
    ds = corpus_dataset(num_rows=300)
    hashed = with_content_sha256(ds, drop_content=False).to_pandas()
    oracle = sha256_oracle(hashed["content"].tolist())
    assert hashed["content_sha256"].tolist() == oracle
    # content projected away by default so wide bytes never shuffle
    slim = with_content_sha256(corpus_dataset(num_rows=10))
    assert "content" not in slim.schema().names


def test_corpus_edges_shape():
    ds = corpus_dataset(num_rows=800)
    edges = derive_corpus_edges(ds).to_pandas()
    # symmetric: every (u,v) has (v,u) with equal weight
    fwd = set(map(tuple, edges[["src", "dst"]].values.tolist()))
    assert all((v, u) in fwd for (u, v) in fwd)
    assert (edges["src"] != edges["dst"]).all()
    assert (edges["weight"] >= 1).all()
    nodes = derive_corpus_nodes(ds).to_pandas()
    assert set(nodes["kind"].unique()) == {"repo", "dir", "commit"}
    # ids collide-free at this scale and deterministic
    assert nodes["id"].is_unique
    edge_ids = set(edges["src"]) | set(edges["dst"])
    assert edge_ids <= set(nodes["id"])


def test_corpus_flagship_end_to_end(tmp_path):
    ds = corpus_dataset(num_rows=600)
    g = Graph(derive_corpus_edges(ds), normalized=True)
    pr = pagerank(g).to_pandas()
    assert pr["pagerank"].sum() == pytest.approx(1.0, abs=1e-8)
    cc = connected_components(g).to_pandas()
    assert cc["component"].nunique() >= 1
    tri_metrics = {}
    triangle_counts(g, metrics=tri_metrics)
    # every corpus row closes a repo-dir-commit triangle
    assert tri_metrics["total_triangles"] > 0


def test_pagerank_checkpoint_resume_bit_identical(tmp_path):
    from centrality_gpu_ray.sources.edgelist import fixture_dataset

    ck = str(tmp_path / "ck")
    cfg_full = EngineConfig(tolerance=1e-10, max_supersteps=500)
    full = pagerank(Graph(fixture_dataset("test4"), config=cfg_full),
                    cfg_full).to_pandas()

    # interrupted run: stop after 7 supersteps, checkpointing every step
    cfg_part = EngineConfig(tolerance=1e-10, max_supersteps=7, checkpoint_dir=ck)
    pagerank(Graph(fixture_dataset("test4"), config=cfg_part), cfg_part)
    # resume to convergence from the manifest
    cfg_res = EngineConfig(tolerance=1e-10, max_supersteps=500, checkpoint_dir=ck)
    resumed = pagerank(Graph(fixture_dataset("test4"), config=cfg_res),
                       cfg_res).to_pandas()
    assert np.array_equal(full["pagerank"].values, resumed["pagerank"].values), \
        "resumed run must be bit-identical to uninterrupted run"


def test_checkpoint_atomicity(tmp_path):
    from centrality_gpu_ray.state.checkpoint import latest_checkpoint, write_checkpoint
    import pyarrow as pa

    root = str(tmp_path / "ck2")
    t = pa.table({"node": pa.array([1, 2, 3]), "pagerank": pa.array([0.1, 0.2, 0.7])})
    write_checkpoint(root, 3, t, {"algorithm": "pagerank"}, num_partitions=2)
    step, manifest, state = latest_checkpoint(root)
    assert step == 3
    assert state.equals(t)
    assert sum(p["rows"] for p in manifest["partitions"]) == 3
    # a newer checkpoint wins
    write_checkpoint(root, 4, t, {"algorithm": "pagerank"})
    assert latest_checkpoint(root)[0] == 4


def test_documents_from_jsonl_and_csv(tmp_path):
    import json as _json

    import numpy as np

    from centrality_gpu_ray.sources.corpus import (
        documents_from_csv, documents_from_jsonl)

    rows = [{"text": "alpha beta", "lang": "en"},
            {"text": "gamma", "lang": "de"},
            {"doc_id": 42, "text": "delta", "lang": "en"}]
    jl = tmp_path / "corpus.jsonl"
    jl.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    ds = documents_from_jsonl(str(jl))
    df = ds.to_pandas()
    assert list(df.columns[:2]) == ["doc_id", "text"]
    assert df["doc_id"].dtype == np.int64
    assert set(df["text"]) == {"alpha beta", "gamma", "delta"}
    # explicit ids survive; minted ids are deterministic (same text ->
    # same id regardless of file/partition layout)
    assert 42 in df["doc_id"].tolist()
    jl2 = tmp_path / "corpus2.jsonl"
    jl2.write_text(_json.dumps(rows[0]) + "\n")
    df2 = documents_from_jsonl(str(jl2)).to_pandas()
    a = df.loc[df["text"] == "alpha beta", "doc_id"].iloc[0]
    assert df2["doc_id"].iloc[0] == a

    cv = tmp_path / "corpus.csv"
    cv.write_text("text,lang\nalpha beta,en\nepsilon,fr\n")
    dfc = documents_from_csv(str(cv)).to_pandas()
    assert list(dfc.columns[:2]) == ["doc_id", "text"]
    # the same text mints the same id across formats
    assert dfc.loc[dfc["text"] == "alpha beta", "doc_id"].iloc[0] == a
    # the normalized output feeds the engine's operators directly
    from centrality_gpu_ray.functions.text import token_stats
    assert token_stats(ds).count() == 3
