from centrality_gpu_ray.stages.ingest import with_content_sha256
from centrality_gpu_ray.stages.edges import (
    derive_corpus_edges,
    symmetrize,
    dedup_edges,
    canonicalize,
)
from centrality_gpu_ray.stages.ids import mint_dense_ids, hash_ids
from centrality_gpu_ray.stages.degrees import degrees, degree_histogram, max_degree_vertex

__all__ = [
    "with_content_sha256",
    "derive_corpus_edges",
    "symmetrize",
    "dedup_edges",
    "canonicalize",
    "mint_dense_ids",
    "hash_ids",
    "degrees",
    "degree_histogram",
    "max_degree_vertex",
]
