"""Training-data curation at 2M documents — the text-pipeline scale
demo (companion to demo_sharded_6m.py's graph-side one).

The sf tables top out at 5,000 documents, so this synthesizes a
2M-row corpus DISTRIBUTED (16 deterministic chunk tasks feeding
``from_arrow_refs`` — the driver never holds the table) and streams it
through the curation surface:

  exact dedup → token accounting → vocab top-k → HLL-vs-exact
  vocabulary cross-check → benchmark-contamination scan → mixture
  sampling → 2048-token sequence packing

Prints one JSON line with per-stage seconds + counts, asserting the
cross-stage invariants inline (dedup monotone, HLL within 5% of the
engine's own exact distinct count, packing chunk-count arithmetic).

Run: python scripts/demo_curation_2m.py [num_rows]  (owns its Ray
session; defaults 2,000,000 rows / 32 CPUs via RAY_GRAFT_CPUS.)
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


def main() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.compute as pc

    from centrality_gpu_ray.functions.contamination import contamination_check
    from centrality_gpu_ray.functions.dedup import exact_dedup, minhash_dedup
    from centrality_gpu_ray.functions.packing import pack_sequences
    from centrality_gpu_ray.functions.sampling import mixture_sample
    from centrality_gpu_ray.functions.sketch import hll_distinct_tokens
    from centrality_gpu_ray.functions.text import token_stats, vocab_topk
    from centrality_gpu_ray.functions.tokenizer import (
        bpe_token_count, bpe_train, encode_word)
    from centrality_gpu_ray.sources.corpus import generate_corpus_table
    from centrality_gpu_ray.stages.shuffle import hash_aggregate

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    chunk = n_rows // CHUNKS
    out: dict = {"rows": n_rows, "stage_sec": {}, "counts": {}}
    marks = [time.perf_counter()]

    def _mark(name: str) -> None:
        now = time.perf_counter()
        out["stage_sec"][name] = round(now - marks[0], 3)
        marks[0] = now

    @ray.remote
    def gen(c: int) -> pa.Table:
        t = generate_corpus_table(num_rows=chunk, seed=9100 + c)
        return pa.table({
            "doc_id": pa.array(np.arange(c * chunk, (c + 1) * chunk,
                                         dtype=np.int64)),
            "text": t.column("content"),
        })

    docs = ray.data.from_arrow_refs(
        [gen.remote(c) for c in range(CHUNKS)]).materialize()
    _mark("synthesize")

    survivors = exact_dedup(docs).materialize()
    n_unique = survivors.count()
    assert 0 < n_unique <= n_rows
    out["counts"]["unique_docs"] = n_unique
    _mark("exact_dedup")

    # MinHash→LSH→Jaccard-verify→CC near-dup funnel at full corpus
    # size with PLANTED near-duplicates and EXACT survivor arithmetic.
    # The snippet-template corpus above is pathologically
    # self-similar (its LSH buckets hit BUCKET_CAP by design — that
    # cap behavior is tested elsewhere); a realistic post-exact-dedup
    # web corpus is diverse, so the funnel runs over a second 2M-doc
    # synthesis: 25 random tokens each from a 50k vocab (two distinct
    # docs share essentially no 3-grams, so natural J≥0.7 pairs do
    # not exist and the arithmetic is exact). 2,000 docs get a
    # companion at doc_id + 2^40 whose text appends one token
    # (3-gram Jaccard (T-2)/(T-1) ≈ 0.96): every companion must land
    # in its source's cluster and die (the source id is the smaller),
    # and keepers must count to exactly n_rows.
    n_plant = 2_000

    @ray.remote
    def gen_diverse(c: int) -> pa.Table:
        rng = np.random.default_rng(7700 + c)
        toks = rng.integers(0, 50_000, size=(chunk, 25))
        texts = [" ".join(map(str, row)) for row in toks]
        return pa.table({
            "doc_id": pa.array(np.arange(c * chunk, (c + 1) * chunk,
                                         dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        })

    nd_docs = ray.data.from_arrow_refs(
        [gen_diverse.remote(c) for c in range(CHUNKS)]).materialize()
    seed_pd = nd_docs.limit(n_plant).to_pandas()
    comp_tbl = pa.table({
        "doc_id": pa.array(seed_pd["doc_id"].to_numpy() + 2 ** 40),
        "text": pa.array((seed_pd["text"] + " zqv").tolist(),
                         type=pa.string()),
    })
    near_in = nd_docs.union(ray.data.from_arrow(comp_tbl))
    _mark("near_dup_synthesize")
    near = minhash_dedup(near_in, threshold=0.7).materialize()
    comp_rows = near.map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], 2 ** 40)),
        batch_format="pyarrow").to_pandas()
    assert len(comp_rows) == n_plant
    assert not comp_rows["keep"].any()          # every companion dies
    src_ids = set(seed_pd["doc_id"].tolist())
    src_rows = near.map_batches(
        lambda t, _s=src_ids: t[t["doc_id"].isin(_s)],
        batch_format="pandas", batch_size=8192).to_pandas()
    merged = comp_rows.assign(src=comp_rows["doc_id"] - 2 ** 40).merge(
        src_rows.rename(columns={"doc_id": "src",
                                 "cluster": "src_cluster"})
        [["src", "src_cluster"]], on="src")
    assert len(merged) == n_plant
    assert (merged["cluster"] == merged["src_cluster"]).all()
    n_keep = near.map_batches(
        lambda t: pa.table({"k": pa.array(
            [t.column("keep").to_numpy(zero_copy_only=False).sum()])}),
        batch_format="pyarrow").sum("k")
    assert int(n_keep) == n_rows                # EXACT: only plants die
    out["counts"].update({"near_dup_planted": n_plant,
                          "near_dup_keepers": int(n_keep),
                          "near_dup_removed": n_rows + n_plant
                          - int(n_keep)})
    _mark("minhash_near_dup")

    # incremental (cross-RUN) near-dedup over the same diverse corpus:
    # run 1 ingests the 2M docs (state = survivors' signatures); run 2
    # ingests n_plant near-dup companions of run-1 docs + n_plant
    # genuinely fresh docs — EXACT arithmetic: every companion dies
    # against the persisted state (signature agreement ≈ 0.97 ≫ 0.7),
    # every fresh doc survives (diverse synthesis: no natural J≥0.7)
    import shutil
    import tempfile

    from centrality_gpu_ray.functions.dedup import \
        minhash_dedup_incremental

    inc_state = tempfile.mkdtemp(prefix="mh_inc_")
    try:
        surv_r1, _ = minhash_dedup_incremental(nd_docs, inc_state)
        n_r1 = surv_r1.count()
        assert n_r1 == n_rows  # diverse corpus: no internal near-dups
        _mark("incremental_run1_ingest")

        rng_f = np.random.default_rng(4242)
        fresh_toks = rng_f.integers(0, 50_000, size=(n_plant, 25))
        fresh_ids = np.arange(n_plant, dtype=np.int64) + 2 ** 42
        run2 = pa.table({
            "doc_id": pa.array(np.concatenate([
                seed_pd["doc_id"].to_numpy() + 2 ** 41, fresh_ids])),
            "text": pa.array(
                (seed_pd["text"] + " zqv").tolist()
                + [" ".join(map(str, row)) for row in fresh_toks],
                type=pa.string()),
        })
        surv_r2, _ = minhash_dedup_incremental(
            ray.data.from_arrow(run2), inc_state)
        ids_r2 = surv_r2.to_pandas()["doc_id"].to_numpy()
        assert ids_r2.size == n_plant  # exactly the fresh docs
        assert (ids_r2 >= 2 ** 42).all()
        out["counts"].update({
            "incremental_state_docs": int(n_r1),
            "incremental_run2_in": int(run2.num_rows),
            "incremental_run2_survivors": int(ids_r2.size)})
    finally:
        shutil.rmtree(inc_state, ignore_errors=True)
    _mark("incremental_run2_crossdup")

    tok = hash_aggregate(
        token_stats(survivors).map_batches(
            lambda t: pa.table({
                "all": pa.array(np.zeros(len(t), np.int64)),
                "n_tokens": t.column("n_tokens")}),
            batch_format="pyarrow"),
        ["all"], [("n_tokens", "sum")], num_partitions=4).to_pandas()
    total_tokens = int(tok["n_tokens"].iloc[0])
    assert total_tokens > n_unique  # every snippet has several tokens
    out["counts"]["total_tokens"] = total_tokens
    _mark("token_accounting")

    vocab = vocab_topk(survivors, k=100)
    out["counts"]["top_token_count"] = int(vocab.column("count")[0].as_py())
    _mark("vocab_topk")

    # exact distinct tokens via the engine's own keyed aggregate,
    # cross-checked against the shuffle-free HLL estimate
    def _tok_rows(batch):
        text = batch["text"].fillna("").str.strip()
        toks = text[text.str.len() > 0].str.split()
        flat = np.asarray([t for lst in toks for t in lst], dtype=object)
        u = np.unique(flat) if flat.size else flat
        return pa.table({"token": pa.array(u, type=pa.string())})

    exact_vocab = hash_aggregate(
        survivors.map_batches(_tok_rows, batch_format="pandas",
                              batch_size=4096),
        ["token"], [([], "count_all")], num_partitions=32).count()
    est = hll_distinct_tokens(survivors, p=14)
    err = abs(est - exact_vocab) / exact_vocab
    assert err < 0.05, (est, exact_vocab)
    out["counts"].update({"vocab_exact": exact_vocab,
                          "vocab_hll": round(est, 1),
                          "hll_rel_err": round(err, 4)})
    _mark("vocab_distinct_exact_vs_hll")

    bench_texts = survivors.limit(100).to_pandas()["text"].tolist()
    dirty = contamination_check(survivors, bench_texts, n=6).materialize()
    n_dirty = dirty.count()
    assert n_dirty >= 100  # the seeded docs must at least self-match
    out["counts"]["contaminated_docs"] = n_dirty
    _mark("contamination_scan")

    # DSIR selection at full corpus size over the DIVERSE synthesis
    # (the template corpus's self-similar grams would pollute the
    # target distribution, same lesson as the near-dup stage): plant a
    # marker PHRASE in every 667th doc, target = the phrase — the
    # hashed-n-gram importance weights must pull exactly the marker
    # docs to the top (behavioral bound: >=99% of the top-k).
    # Sizing the marker: per-gram log-weight noise comes from bucket
    # collision load (≈6 unigram types × 1000 occurrences per
    # 8192-bucket → sd(log raw[b]) ≈ 0.2); a 25-token doc sums ~49
    # gram draws → doc-weight sd ≈ 1.45, and the top-3000-of-2M
    # cutoff sits ≈ 3.2σ ≈ +4.6.  A 2-token marker (~3 boosted grams
    # ≈ +4.1) lands AT the cutoff — measured 42% marker frac.  The
    # 8-token phrase below adds ~16 boosted grams ≈ +22: ~12σ clear.
    from centrality_gpu_ray.functions.selection import dsir_select

    marker = "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8"

    def plant_marker(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        text = pd.Series(t.column("text").to_pandas())
        m = ids % 667 == 0
        text[m] = text[m] + " " + marker
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(text, type=pa.string())})

    # repartition: dsir streams the corpus twice (fit + score) and the
    # 16 synthesis blocks would cap task parallelism below the 32 CPUs
    marked = nd_docs.map_batches(plant_marker, batch_format="pyarrow") \
        .repartition(64).materialize()
    n_marked = len(range(0, n_rows, 667))
    target = [marker] * 4
    _mark("dsir_plant")
    sel = dsir_select(marked, target, k=n_marked)
    sel_ids = sel.column("doc_id").to_numpy()
    frac = float((sel_ids % 667 == 0).mean())
    assert frac >= 0.99, frac
    out["counts"].update({"dsir_marked": n_marked,
                          "dsir_topk_marker_frac": round(frac, 4)})
    _mark("dsir_select")

    # ExactSubstr-style repeated-span removal at full corpus size, over
    # the DIVERSE synthesis (random 50k-vocab tokens: two docs share
    # essentially no 10-gram, so the planted span is the ONLY
    # duplicated gram and the arithmetic is exact). Every 997th doc
    # gets the same 10-token boilerplate appended: the all-marker
    # window repeats ~2k times (duplicated), every base/straddle window
    # contains doc-unique random tokens (count 1) — so exactly the 10
    # marker tokens must vanish from each planted doc and nothing else.
    from centrality_gpu_ray.functions.dedup import remove_repeated_spans

    boiler = " ".join(f"by{i}" for i in range(10))

    def plant_span(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        text = pd.Series(t.column("text").to_pandas())
        m = ids % 997 == 0
        text[m] = text[m] + " " + boiler
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(text, type=pa.string())})

    spanned = nd_docs.map_batches(plant_span, batch_format="pyarrow") \
        .repartition(64).materialize()
    n_span_docs = len(range(0, n_rows, 997))
    # exact expectation, straddle windows included: if two MARKED docs
    # share their last j base tokens, the (j base + 10-j marker) window
    # also repeats and covers j extra tokens for each — per marked doc
    # the extra is the max such j (birthday at 2M: a few docs share a
    # 1-token tail). The marked set is tiny (n_rows/997), so the exact
    # driver-side account costs nothing.
    from collections import Counter
    def _marked_only(tb: pa.Table) -> pa.Table:
        ids = tb.column("doc_id").to_numpy(zero_copy_only=False)
        return tb.filter(pa.array(ids % 997 == 0))

    mk_tails = [t.split()[-9:] for t in nd_docs.map_batches(
        _marked_only, batch_format="pyarrow").to_pandas()["text"]]
    extra = np.zeros(len(mk_tails), np.int64)
    for j in range(1, 10):
        cnt = Counter(tuple(t[-j:]) for t in mk_tails)
        for i, t in enumerate(mk_tails):
            if cnt[tuple(t[-j:])] >= 2:
                extra[i] = j
    expected_removed = 10 * n_span_docs + int(extra.sum())
    _mark("span_plant")
    stripped = remove_repeated_spans(spanned, n=10).materialize()
    assert stripped.count() == n_rows           # no doc fully covered
    rem = stripped.map_batches(
        lambda t: pa.table({
            "all": pa.array(np.zeros(len(t), np.int64)),
            "n_removed": t.column("n_removed"),
            "touched": pa.array((t.column("n_removed").to_numpy()
                                 > 0).astype(np.int64))}),
        batch_format="pyarrow")
    ragg = hash_aggregate(rem, ["all"], [("n_removed", "sum"),
                                         ("touched", "sum")],
                          num_partitions=2).to_pandas()
    assert int(ragg["n_removed"].iloc[0]) == expected_removed  # EXACT
    assert int(ragg["touched"].iloc[0]) == n_span_docs
    sample = stripped.map_batches(
        lambda t: t.filter(pc.greater(t["n_removed"], 0)),
        batch_format="pyarrow").limit(5).to_pandas()
    assert all("by" not in s and len(s.split()) >= 16
               for s in sample["text"])         # marker gone, base kept
    out["counts"].update({"span_planted_docs": n_span_docs,
                          "span_tokens_removed":
                          int(ragg["n_removed"].iloc[0]),
                          "span_straddle_extra": int(extra.sum())})
    _mark("repeated_span_removal")

    # quality classifier at full corpus size: label = doc_id parity,
    # odd docs get 4 junk-vocab tokens appended — a linearly separable
    # planted signal over the hashed n-gram features. Deterministic
    # full-batch GD (6 iterations over the materialized bucket-stream
    # Dataset), then one scoring pass; accuracy aggregated distributed
    # (labels re-derived from doc_id inside each batch, no join).
    from centrality_gpu_ray.functions.classifier import (
        featurize_hashed_ngrams, quality_scores,
        train_quality_classifier)

    def plant_label(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        text = pd.Series(t.column("text").to_pandas())
        odd = (ids % 2) == 1
        rng_l = np.random.default_rng(ids[0] if ids.size else 0)
        junk = np.array([f"jk{i}" for i in range(20)])
        tails = [" ".join(rng_l.choice(junk, size=4))
                 for _ in range(int(odd.sum()))]
        text[odd] = text[odd] + " " + pd.Series(tails,
                                                index=text[odd].index)
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(text, type=pa.string()),
                         "label": pa.array((ids % 2).astype(np.int64))})

    labeled = nd_docs.map_batches(plant_label, batch_format="pyarrow") \
        .repartition(64).materialize()
    feats = featurize_hashed_ngrams(labeled, label_col="label")
    _mark("classifier_featurize")
    model = train_quality_classifier(labeled, iters=6, features=feats)
    _mark("classifier_train")
    acc_rows = quality_scores(labeled, model, features=feats) \
        .map_batches(lambda t: pa.table({
            "all": pa.array(np.zeros(len(t), np.int64)),
            "correct": pa.array(
                ((t.column("quality_prob").to_numpy() >= 0.5)
                 == ((t.column("doc_id").to_numpy() % 2) == 1))
                .astype(np.int64))}), batch_format="pyarrow")
    cagg = hash_aggregate(acc_rows, ["all"], [("correct", "sum")],
                          num_partitions=2).to_pandas()
    acc = int(cagg["correct"].iloc[0]) / n_rows
    assert acc >= 0.99, acc
    assert model["loss_curve"][-1] < model["loss_curve"][0]
    out["counts"]["classifier_train_acc"] = round(acc, 5)
    _mark("classifier_score")

    # CCNet-shaped LM perplexity gate at full corpus size: fit a tiny
    # target LM driver-side (the realistic shape — CCNet's reference
    # corpus is small next to the crawl), score + filter the 2M corpus
    # in ONE streaming pass. Every 499th doc becomes a 24-token
    # low-entropy prototype (log_ppl 6.55 exactly, constant); random
    # 50k-vocab docs score ≥10.9 (a sub-threshold crossing needs ~11
    # independent 2/2^16 bucket collisions in one doc — never happens),
    # so the 9.0 cut keeps EXACTLY the planted set.
    from centrality_gpu_ray.functions.lm import lm_filter, lm_fit_texts

    proto = " ".join(["lm1", "lm2"] * 12)

    def plant_lm(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        text = pd.Series(t.column("text").to_pandas())
        text[ids % 499 == 0] = proto
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(text, type=pa.string())})

    lm_in = nd_docs.map_batches(plant_lm, batch_format="pyarrow") \
        .repartition(64).materialize()
    n_lm = len(range(0, n_rows, 499))
    _mark("lm_plant")
    lm_model = lm_fit_texts([proto] * 4)
    kept_lm = lm_filter(lm_in, lm_model, max_log_ppl=9.0).materialize()
    assert kept_lm.count() == n_lm                  # EXACT survivor set
    n_stray = kept_lm.map_batches(
        lambda t: pa.table({"b": pa.array([int(
            (t.column("doc_id").to_numpy(zero_copy_only=False)
             % 499 != 0).sum())])}),
        batch_format="pyarrow").sum("b")
    assert int(n_stray) == 0
    out["counts"].update({"lm_planted": n_lm,
                          "lm_kept": kept_lm.count()})
    _mark("lm_perplexity_filter")

    mixed = mixture_sample(survivors, {"und": 0.5}, default_rate=1.0)
    n_mixed = mixed.count()
    assert 0 < n_mixed < n_unique
    out["counts"]["after_mixture"] = n_mixed
    _mark("mixture_sample")

    # BPE tokenizer at corpus scale: ONE distributed exact word-count
    # pass trains the merge table driver-side (vocabulary-sized, never
    # corpus-sized); the broadcast memoized encode then counts
    # trained-tokenizer tokens over every survivor doc. Words only
    # ever merge, so the corpus piece total is bounded below by the
    # whitespace token total (equality iff every word fully merged).
    tok_model = bpe_train(survivors, num_merges=2000, max_words=20_000)
    ranks = {tuple(m): r for r, m in enumerate(tok_model["merges"])}
    top_word = vocab.column("token")[0].as_py()
    top_enc = encode_word(top_word, ranks)
    assert "".join(top_enc) == top_word + "</w>"
    # discriminating: the corpus' most frequent word must actually have
    # MERGED (fewer pieces than characters) — concatenation-reversibility
    # alone holds for any ranks dict, even an empty one
    assert len(top_word) <= 1 or len(top_enc) < len(top_word), (
        top_word, top_enc)
    bagg = hash_aggregate(
        bpe_token_count(survivors, tok_model).map_batches(
            lambda t: pa.table({
                "all": pa.array(np.zeros(len(t), np.int64)),
                "n_bpe_tokens": t.column("n_bpe_tokens")}),
            batch_format="pyarrow"),
        ["all"], [("n_bpe_tokens", "sum"), ([], "count_all")],
        num_partitions=2).to_pandas()
    bpe_total = int(bagg["n_bpe_tokens"].iloc[0])
    assert int(bagg["count"].iloc[0]) == n_unique  # every doc counted
    assert bpe_total >= total_tokens
    out["counts"].update({
        "bpe_merges": len(tok_model["merges"]),
        "bpe_tokens_total": bpe_total,
        "bpe_pieces_per_word": round(bpe_total / total_tokens, 3)})
    _mark("bpe_tokenizer")

    packed = pack_sequences(survivors, context_len=2048)
    span = packed.map_batches(
        lambda t: pa.table({
            "all": pa.array(np.zeros(len(t), np.int64)),
            "n_tokens": t.column("n_tokens"),
            "last_chunk": t.column("last_chunk")}),
        batch_format="pyarrow")
    agg = hash_aggregate(span, ["all"], [("n_tokens", "sum"),
                                         ("last_chunk", "max")],
                         num_partitions=2).to_pandas()
    packed_tokens = int(agg["n_tokens"].iloc[0])
    max_chunk = int(agg["last_chunk"].iloc[0])
    assert max_chunk == (packed_tokens - 1) // 2048  # layout arithmetic
    out["counts"].update({"packed_tokens": packed_tokens,
                          "context_chunks_2048": max_chunk + 1})
    _mark("sequence_packing")

    out["total_sec"] = round(sum(out["stage_sec"].values()), 3)
    out["docs_per_sec_curation"] = round(
        n_rows / max(1e-9, out["total_sec"] - out["stage_sec"]["synthesize"]))
    print(json.dumps(out))
    ray.shutdown()
    return out


if __name__ == "__main__":
    main()
