"""Sketch / scrub / search / clustering at scale — 2M documents and
500k embeddings, companion to demo_curation_2m.py (text funnel) and
demo_sharded_6m.py (graph side).

Synthesizes the corpus DISTRIBUTED (deterministic chunk tasks →
``from_arrow_refs``; the driver never holds the table), planting one
email + one IPv4 in every 1000th document so redaction arithmetic is
exactly checkable, then streams:

  PII scrub (audit counts == planted counts, exactly)
  → NFC/whitespace normalization
  → histogram quantile sketch over n_chars (exact integer mode)
  → count-min token-frequency sketch (estimates >= truth by design)
  → BM25 top-10 keyword retrieval (two streaming passes)
  → distributed Lloyd k-means over 500k x 32-d embeddings (4 rounds)

Prints one JSON line with per-stage seconds + invariant checks.

Run: python scripts/demo_sketch_search_2m.py [num_rows] (owns its Ray
session; defaults 2,000,000 rows / 32 CPUs via RAY_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RAY_worker_niceness", "0")

CHUNKS = 16
PLANT_EVERY = 1000
PLANT = " contact planted.user@example.com from 10.1.2.3 now"


def main() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.compute as _pc

    from centrality_gpu_ray.functions.clustering import (kmeans_fit,
                                                         semantic_dedup)
    from centrality_gpu_ray.functions.scrub import normalize_text, scrub_pii
    from centrality_gpu_ray.functions.search import bm25_topk
    from centrality_gpu_ray.functions.sketch import (
        cms_build, cms_query, column_quantiles)
    from centrality_gpu_ray.sources.corpus import generate_corpus_table

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    chunk = n_rows // CHUNKS
    n_vecs = max(1000, n_rows // 4)
    vec_chunk = n_vecs // CHUNKS
    out: dict = {"rows": n_rows, "vecs": n_vecs, "stage_sec": {},
                 "counts": {}}
    marks = [time.perf_counter()]

    def _mark(name: str) -> None:
        now = time.perf_counter()
        out["stage_sec"][name] = round(now - marks[0], 3)
        marks[0] = now

    @ray.remote
    def gen(c: int) -> pa.Table:
        t = generate_corpus_table(num_rows=chunk, seed=9300 + c)
        ids = np.arange(c * chunk, (c + 1) * chunk, dtype=np.int64)
        text = t.column("content").to_pandas()
        planted = ids % PLANT_EVERY == 0
        text[planted] = text[planted] + PLANT
        return pa.table({
            "doc_id": pa.array(ids),
            "text": pa.array(text, type=pa.string()),
            "n_chars": pa.array(text.str.len().to_numpy(np.int64)),
        })

    docs = ray.data.from_arrow_refs(
        [gen.remote(c) for c in range(CHUNKS)]).materialize()
    n_planted = sum(1 for i in range(0, n_rows, PLANT_EVERY))
    _mark("synthesize")

    # --- PII scrub: audit counts must equal planted counts exactly ---
    scrubbed = scrub_pii(docs)

    def _audit(t: pa.Table) -> pa.Table:
        return pa.table({
            "emails": [int(np.sum(t.column("n_email").to_numpy()))],
            "ips": [int(np.sum(t.column("n_ipv4").to_numpy()))],
            "rows": [t.num_rows]})

    audit = scrubbed.map_batches(_audit, batch_format="pyarrow") \
        .to_pandas().sum()
    assert int(audit["rows"]) == n_rows
    assert int(audit["emails"]) == n_planted, (audit["emails"], n_planted)
    assert int(audit["ips"]) == n_planted
    out["counts"]["planted_pii"] = n_planted
    _mark("scrub_pii")

    assert normalize_text(docs, lowercase=True).count() == n_rows
    _mark("normalize")

    q = column_quantiles(docs, "n_chars", qs=(0.25, 0.5, 0.75, 0.99))
    vals = [q["q25"], q["q50"], q["q75"], q["q99"]]
    assert all(vals[i] <= vals[i + 1] for i in range(3))
    out["counts"]["n_chars_quantiles"] = q
    _mark("quantile_sketch")

    cms = cms_build(docs, "text", depth=4, width=1 << 15, tokens=True)
    est = cms_query(cms, ["from", "planted.user@example.com"])
    # "from" appears at least once per planted doc; CMS never under-counts
    assert est[1] >= n_planted
    out["counts"]["cms_planted_email_est"] = int(est[1])
    _mark("cms_tokens")

    # span-level dedup at scale: plant a boilerplate paragraph on every
    # 10th doc; after removal exactly ONE doc still contains it
    from centrality_gpu_ray.functions.dedup import remove_repeated_paragraphs

    boiler = "FOLLOW US FOR MORE UPDATES EVERY DAY"

    def plant_boiler(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        text = pd.Series(t.column("text").to_pandas())
        m = ids % 10 == 0
        text[m] = text[m] + "\n" + boiler
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(text, type=pa.string())})

    spanned = docs.map_batches(plant_boiler,
                               batch_format="pyarrow").materialize()
    marks[0] = time.perf_counter()  # don't bill the planting
    deduped = remove_repeated_paragraphs(spanned).materialize()
    n_out = deduped.count()
    assert 0 < n_out <= n_rows
    n_boiler = deduped.map_batches(
        lambda t: pa.table({"n": [int(np.sum(np.char.find(np.asarray(
            t.column("text").to_pylist(), dtype=str), boiler) >= 0))]}),
        batch_format="pyarrow").to_pandas()["n"].sum()
    assert int(n_boiler) == 1, n_boiler
    out["counts"]["para_dedup_docs_out"] = n_out
    _mark("paragraph_dedup")

    top = bm25_topk(docs, ["planted.user@example.com", "from"], k=10)
    assert len(top) == 10 and (top["score"] > 0).all()
    # planted docs dominate: the rare term carries almost all the idf
    assert (top["doc_id"].to_numpy() % PLANT_EVERY == 0).all()
    out["counts"]["bm25_top_score"] = round(float(top["score"].iloc[0]), 4)
    _mark("bm25_topk")

    # --- hashed TF-IDF vectors over the full corpus ---
    # exact planted arithmetic: the PLANT suffix's email token is
    # unique to planted docs, so its feature bucket's document
    # frequency is >= n_planted (hash collisions only ADD), and every
    # planted doc's vector is positive exactly there
    import hashlib

    from centrality_gpu_ray.functions.vectorize import (
        document_frequencies, hashed_tfidf)

    tfidf_dim = 128
    email_tok = "planted.user@example.com"
    b_email = int(hashlib.sha256(email_tok.encode()).hexdigest()[:15],
                  16) % tfidf_dim
    df_vec, n_df = document_frequencies(docs, dim=tfidf_dim)
    assert n_df == n_rows
    assert df_vec[b_email] >= n_planted, (df_vec[b_email], n_planted)
    vecs_ds = hashed_tfidf(docs, dim=tfidf_dim)
    first = vecs_ds.map_batches(
        lambda t: t.filter(_pc.equal(t["doc_id"], 0)),
        batch_format="pyarrow").to_pandas()
    assert len(first) == 1
    assert np.asarray(first["embedding"].iloc[0])[b_email] > 0.0
    out["counts"]["tfidf_email_bucket_df"] = int(df_vec[b_email])
    _mark("tfidf_vectors_2m")

    # --- distributed k-means over synthesized embeddings ---
    @ray.remote
    def gen_vec(c: int) -> pa.Table:
        rng = np.random.default_rng(77 + c)
        centers = rng.standard_normal((8, 32)) * 5.0
        lab = rng.integers(0, 8, vec_chunk)
        X = centers[lab] + rng.standard_normal((vec_chunk, 32))
        ids = np.arange(c * vec_chunk, (c + 1) * vec_chunk,
                        dtype=np.int64)
        return pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(X.astype(np.float64)),
                                  type=pa.list_(pa.float64()))})

    emb = ray.data.from_arrow_refs(
        [gen_vec.remote(c) for c in range(CHUNKS)]).materialize()
    _mark("synthesize_embeddings")

    # --- distributed exact PCA + whitening over the 500k vectors ---
    # One streaming pass of (count, Σx, ΣxxT) block partials; the
    # 8-blob mixture has ≤ 8-dimensional between-cluster structure, so
    # the top components must carry the blob variance (≫ the unit
    # noise floor) and whitening must land every kept coordinate at
    # exactly unit variance — both asserted from a second streaming
    # moment pass over the projected Dataset.
    from centrality_gpu_ray.functions.decomposition import (pca_fit,
                                                            pca_transform)

    pfit = pca_fit(emb, n_components=16)
    assert pfit["n_rows"] == n_vecs
    ev = pfit["explained_variance"]
    assert ev[0] > 10.0 and (np.diff(ev) <= 1e-9).all()
    white = pca_transform(emb, pfit, whiten=True).materialize()
    wfit = pca_fit(white.map_batches(
        lambda t: pa.table({"vec_id": t.column("vec_id"),
                            "embedding": t.column("pca")}),
        batch_format="pyarrow"), n_components=16)
    # whitened variances are exactly 1 in EVERY kept direction
    assert np.abs(wfit["explained_variance"] - 1.0).max() < 1e-6
    out["counts"]["pca_top4_variance"] = [round(float(v), 2)
                                          for v in ev[:4]]
    _mark("pca_whiten_500k")

    fit = kmeans_fit(emb, k=64, iters=4, tol=0.0)
    h = fit["inertia_history"]
    assert all(h[i + 1] <= h[i] + 1e-6 for i in range(len(h) - 1))
    out["counts"]["kmeans_inertia"] = [round(x) for x in h]
    _mark("kmeans_4_iters")

    # --- SemDeDup-style semantic dedup at 500k vectors ---
    # Plant 1,000 exact-duplicate companions (identical vector → same
    # argmin cell ALWAYS, cosine exactly 1); natural within-blob
    # cosines sit at ~0.96±0.03 (centers ‖c‖≈28, unit noise), so
    # threshold 0.999 makes the survivor arithmetic EXACT. Perturbed
    # companions can flip across a k-means cell boundary — the
    # documented SemDeDup approximation — which is why the pytest
    # suite (well-separated blobs) owns the perturbed case. Reuses
    # the centroids just fitted — no second k-means pass.
    n_plant_v = 1_000
    seed_vs = emb.limit(n_plant_v).to_pandas()
    comp_v = pa.table({
        "vec_id": pa.array(seed_vs["vec_id"].to_numpy() + 2 ** 40),
        "embedding": pa.array([list(np.asarray(v, dtype=np.float64))
                               for v in seed_vs["embedding"]],
                              type=pa.list_(pa.float64()))})
    n_base_v = emb.count()
    sem_in = emb.union(ray.data.from_arrow(comp_v))
    sem = semantic_dedup(sem_in, k=64, threshold=0.999,
                         centroids=fit["centroids"],
                         num_partitions=32).materialize()
    keepers = sem.map_batches(
        lambda t: pa.table({"k": pa.array(
            [int(t.column("keep").to_numpy(zero_copy_only=False).sum())])}),
        batch_format="pyarrow").sum("k")
    comp_sem = sem.map_batches(
        lambda t: t.filter(_pc.greater_equal(t["vec_id"], 2 ** 40)),
        batch_format="pyarrow").to_pandas()
    assert len(comp_sem) == n_plant_v
    assert not comp_sem["keep"].any()       # every companion dies
    assert int(keepers) == n_base_v         # EXACT: only plants die
    out["counts"]["semantic_dedup_planted"] = n_plant_v
    out["counts"]["semantic_dedup_keepers"] = int(keepers)
    _mark("semantic_dedup_500k")

    out["total_sec"] = round(sum(out["stage_sec"].values()), 3)
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
