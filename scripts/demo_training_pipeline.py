"""End-to-end training-data curation + graph analytics demo.

Chains the engine's operator families the way a 100 TB corpus run
would — every stage is the same distributed code path the oracle gate
checks, composed:

  documents ──ingest sha256──┐
      │ exact dedup (hash-partitioned winner marking)
      │ MinHash+LSH near-dup clustering (keepers only)
      │ quality + language filters (actor/task-pool scoring, semi-joins)
      │ benchmark-contamination scrub (broadcast n-gram membership)
      │ mixture rebalance (per-language sha256 thresholds)
      ▼
  curated corpus ──token stats──► corpus size accounting
      └─ sequence packing ──► 2048-token context chunks + fill stats
  synthetic corpus (input_hint shape) ──co-occurrence edges──►
      Graph ──► PageRank + components + decomposed exact BC
  embeddings ──► IVF ANN vs brute-force ground truth (recall check)

Run:  python scripts/demo_training_pipeline.py [sf_dir]
(defaults to $GRAFT_SF_DIR or /root/testdata/sf0.01; owns its Ray
session — do not call from driver-managed code.)

Prints one JSON line: per-stage seconds, row counts at each curation
step, and the IVF recall vs exact ANN. Asserts the invariants inline
(monotone survivor counts, PageRank mass, decomposed-BC spot parity,
recall floor) so a regression fails loudly rather than drifting.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RAY_worker_niceness", "0")


def main() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from centrality_gpu_ray.functions.dedup import exact_dedup, minhash_dedup
    from centrality_gpu_ray.functions.similarity import (ann_brute_force,
                                                         ann_ivf)
    from centrality_gpu_ray.functions.text import (language_id,
                                                   quality_scores,
                                                   token_stats)
    from centrality_gpu_ray.pipelines.bc_decomp import betweenness_decomposed
    from centrality_gpu_ray.pipelines.components import connected_components
    from centrality_gpu_ray.pipelines.graph import Graph
    from centrality_gpu_ray.pipelines.pagerank import pagerank
    from centrality_gpu_ray.sources.corpus import corpus_dataset
    from centrality_gpu_ray.stages.edges import derive_corpus_edges
    from centrality_gpu_ray.stages.ingest import with_content_sha256
    from centrality_gpu_ray.stages.shuffle import (hash_aggregate,
                                                   hash_semi_join)

    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    out: dict = {"sf_dir": sf_dir, "stage_sec": {}, "counts": {}}
    marks = [time.perf_counter()]

    def _mark(name: str) -> None:
        now = time.perf_counter()
        out["stage_sec"][name] = round(now - marks[0], 3)
        marks[0] = now

    # ---- 1. corpus curation over the documents table -------------------
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    n_raw = docs.count()
    _mark("read")

    # raw corpus composition dashboard (per source x lang totals)
    from centrality_gpu_ray.functions.text import corpus_report

    report = corpus_report(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"])).to_pandas()
    assert int(report["n_docs"].sum()) == n_raw
    out["counts"]["composition_groups"] = len(report)
    _mark("composition_report")

    survivors = exact_dedup(docs).materialize()
    n_exact = survivors.count()
    assert 0 < n_exact <= n_raw
    _mark("exact_dedup")

    clusters = minhash_dedup(survivors, threshold=0.7)
    keepers = clusters.map_batches(
        lambda t: t.filter(pc.field("keep")).select(["doc_id"]),
        batch_format="pyarrow")
    survivors = hash_semi_join(survivors, keepers, on="doc_id").materialize()
    n_near = survivors.count()
    assert 0 < n_near <= n_exact
    _mark("near_dedup")

    q_pass = quality_scores(survivors).map_batches(
        lambda t: t.filter(pc.greater_equal(pc.field("quality"), 0.30))
        .select(["doc_id"]), batch_format="pyarrow")
    l_pass = language_id(survivors).map_batches(
        lambda t: t.filter(pc.not_equal(pc.field("pred_lang"), "und"))
        .select(["doc_id"]), batch_format="pyarrow")
    curated = hash_semi_join(hash_semi_join(survivors, q_pass, on="doc_id"),
                             l_pass, on="doc_id").materialize()
    n_curated = curated.count()
    assert 0 < n_curated <= n_near
    _mark("quality_lang_filter")

    # contamination scrub: drop docs overlapping a (synthetic) eval
    # suite — here the 3 lexically-largest doc texts stand in for a
    # benchmark; broadcast path, one streaming pass
    from centrality_gpu_ray.functions.contamination import contamination_check

    bench_texts = (curated.to_pandas().nlargest(3, "doc_id")["text"]
                   .fillna("").tolist())
    dirty = contamination_check(curated, bench_texts, n=6).map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    # subtract the contaminated set with the distributed anti-join —
    # the dirty ids never land on the driver
    from centrality_gpu_ray.stages.shuffle import hash_anti_join

    clean = hash_anti_join(curated, dirty, on="doc_id").materialize()
    n_clean = clean.count()
    assert 0 < n_clean < n_curated  # the 3 seeded docs must be caught
    _mark("contamination_scrub")

    # PII audit over the surviving corpus: redaction counts per shard
    from centrality_gpu_ray.functions.scrub import scrub_pii

    scrubbed = scrub_pii(clean)
    redactions = scrubbed.map_batches(
        lambda t: pa.table({"n": [int(
            pc.sum(t.column("n_email")).as_py() or 0) + int(
            pc.sum(t.column("n_ipv4")).as_py() or 0) + int(
            pc.sum(t.column("n_phone")).as_py() or 0)]}),
        batch_format="pyarrow").to_pandas()["n"].sum()
    out["counts"]["pii_redactions"] = int(redactions)
    _mark("pii_audit")

    # mixture rebalance: keep all en, half the rest, quarter of 'und'
    from centrality_gpu_ray.functions.sampling import mixture_sample

    mix_ids = mixture_sample(clean, {"en": 0.8, "und": 0.25},
                             default_rate=0.5).map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    mixed = hash_semi_join(clean, mix_ids, on="doc_id").materialize()
    n_mixed = mixed.count()
    assert 0 < n_mixed < n_clean  # every language is downsampled
    _mark("mixture_sample")

    # sequence packing: lay the final corpus into 2048-token windows
    from centrality_gpu_ray.functions.packing import (chunk_fill_stats,
                                                      pack_sequences)

    packed = pack_sequences(mixed, context_len=2048)
    pdf = packed.to_pandas()
    packed_tokens = int(pdf["n_tokens"].sum()) if len(pdf) else 0
    n_chunks = len(chunk_fill_stats(packed, context_len=2048).to_pandas())
    assert n_chunks == -(-packed_tokens // 2048)  # exact chunk count
    _mark("sequence_packing")

    tok = hash_aggregate(
        token_stats(curated).map_batches(
            lambda t: pa.table({"all": pa.array(np.zeros(len(t), np.int64)),
                                "n_tokens": t.column("n_tokens")}),
            batch_format="pyarrow"),
        ["all"], [("n_tokens", "sum")], num_partitions=4).to_pandas()
    total_tokens = int(tok["n_tokens"].iloc[0]) if len(tok) else 0
    assert total_tokens > 0
    _mark("token_accounting")

    out["counts"].update({"docs_raw": n_raw, "after_exact_dedup": n_exact,
                          "after_near_dedup": n_near,
                          "after_quality_lang": n_curated,
                          "after_contamination": n_clean,
                          "after_mixture": n_mixed,
                          "packed_tokens": packed_tokens,
                          "context_chunks_2048": n_chunks,
                          "curated_tokens": total_tokens})

    # ---- 2. graph analytics over the input_hint-shaped corpus ----------
    corpus = corpus_dataset(num_rows=2_000, seed=7)
    with_content_sha256(corpus).materialize()  # ingest invariant stage
    g = Graph(derive_corpus_edges(corpus), normalized=True)
    pr = pagerank(g).to_pandas()
    assert abs(pr["pagerank"].sum() - 1.0) < 1e-8
    cc = connected_components(g)
    n_comp = len(np.unique(cc.column("component").to_numpy()))
    m_bc: dict = {}
    bc = betweenness_decomposed(g, concurrency=4, metrics=m_bc).to_pandas()
    assert (bc["bc"] >= -1e-9).all()
    _mark("graph_analytics")
    out["counts"].update({
        "graph_vertices": g.num_vertices, "graph_edges": g.num_edges,
        "graph_components": int(n_comp),
        "bc_blocks_run": m_bc.get("num_bcc_run"),
        "top_pagerank_node": int(pr.loc[pr["pagerank"].idxmax(), "node"]),
    })

    # ---- 3. embeddings: IVF ANN recall vs brute-force ground truth -----
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    head = pa.concat_tables(list(
        emb.limit(32).iter_batches(batch_size=None, batch_format="pyarrow")))
    Q = np.vstack([np.asarray(v, dtype=np.float64)
                   for v in head.column("embedding").to_pylist()])
    k = 10
    truth = ann_brute_force(emb, Q, k=k).to_pandas()
    approx = ann_ivf(emb, Q, k=k, nlist=32, nprobe=8).to_pandas()
    hits = 0
    for qid in range(Q.shape[0]):
        t_ids = set(truth.loc[truth["query_id"] == qid, "vec_id"])
        a_ids = set(approx.loc[approx["query_id"] == qid, "vec_id"])
        hits += len(t_ids & a_ids)
    recall = hits / float(k * Q.shape[0])
    assert recall >= 0.6, f"IVF recall collapsed: {recall:.3f}"
    _mark("ann_recall")
    out["counts"]["ivf_recall_at_10"] = round(recall, 4)

    out["total_sec"] = round(sum(out["stage_sec"].values()), 3)
    print(json.dumps(out))
    ray.shutdown()
    return out


if __name__ == "__main__":
    main()
