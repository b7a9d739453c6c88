from centrality_gpu_ray.functions.text import (
    TextAnalyzer, token_stats, quality_scores, language_id, fingerprints)
from centrality_gpu_ray.functions.dedup import (
    exact_dedup, minhash_dedup, simhash_signatures, simhash_dedup,
    ngram_jaccard_pairs, embedding_near_dup)
from centrality_gpu_ray.functions.similarity import ann_brute_force, ann_lsh
from centrality_gpu_ray.functions.multimodal import (
    synth_media_table, decode_media, extract_features, sample_frames)

__all__ = [
    "TextAnalyzer", "token_stats", "quality_scores", "language_id", "fingerprints",
    "exact_dedup", "minhash_dedup", "simhash_signatures", "simhash_dedup",
    "ngram_jaccard_pairs", "embedding_near_dup",
    "ann_brute_force", "ann_lsh",
    "synth_media_table", "decode_media", "extract_features", "sample_frames",
]
