from centrality_gpu_ray.functions.text import (
    TextAnalyzer, token_stats, quality_scores, language_id, fingerprints,
    corpus_report)
from centrality_gpu_ray.functions.dedup import (
    exact_dedup, exact_dedup_best, exact_dedup_incremental,
    minhash_dedup, minhash_dedup_incremental, simhash_signatures,
    simhash_dedup, ngram_jaccard_pairs, embedding_near_dup,
    remove_repeated_paragraphs)
from centrality_gpu_ray.functions.decomposition import (pca_fit,
                                                        pca_transform)
from centrality_gpu_ray.functions.similarity import ann_brute_force, ann_lsh
from centrality_gpu_ray.functions.vectorize import (document_frequencies,
                                                    hashed_tfidf)
from centrality_gpu_ray.functions.pq import (ann_ivfpq_topk, ann_pq_topk,
                                             pq_encode, pq_train)
from centrality_gpu_ray.functions.multimodal import (
    synth_media_table, decode_media, extract_features, sample_frames)
from centrality_gpu_ray.functions.sketch import (
    hll_distinct, hll_distinct_tokens, column_histogram, column_quantiles,
    cms_build, cms_query, filter_by_quantile)
from centrality_gpu_ray.functions.similarity import project_embeddings
from centrality_gpu_ray.functions.repetition import (repetition_stats,
    repetition_filter)
from centrality_gpu_ray.functions.scrub import scrub_pii, normalize_text
from centrality_gpu_ray.functions.selection import (dsir_fit, dsir_select,
    dsir_weights)
from centrality_gpu_ray.functions.search import bm25_topk, corpus_stats
from centrality_gpu_ray.functions.clustering import (
    kmeans, kmeans_assign, kmeans_fit, semantic_dedup)

__all__ = [
    "TextAnalyzer", "token_stats", "quality_scores", "language_id", "fingerprints",
    "exact_dedup", "exact_dedup_incremental", "minhash_dedup",
    "minhash_dedup_incremental", "simhash_signatures", "simhash_dedup",
    "ngram_jaccard_pairs", "embedding_near_dup",
    "ann_brute_force", "ann_lsh",
    "synth_media_table", "decode_media", "extract_features", "sample_frames",
    "hll_distinct", "hll_distinct_tokens", "column_histogram",
    "column_quantiles", "cms_build", "cms_query",
    "scrub_pii", "normalize_text", "bm25_topk", "corpus_stats",
    "kmeans", "kmeans_assign", "kmeans_fit", "semantic_dedup",
    "filter_by_quantile", "project_embeddings", "corpus_report",
    "remove_repeated_paragraphs", "repetition_stats", "repetition_filter", "dsir_fit", "dsir_weights", "dsir_select",
    "hashed_tfidf", "document_frequencies", "pq_train", "pq_encode",
    "ann_pq_topk", "ann_ivfpq_topk", "exact_dedup_best",
    "pca_fit", "pca_transform",
]
