from centrality_gpu_ray.sources.corpus import generate_corpus_table, corpus_dataset
from centrality_gpu_ray.sources.edgelist import (
    FIXTURE_EDGES,
    fixture_edges_table,
    parse_edgelist_text,
    read_edgelist,
)

__all__ = [
    "generate_corpus_table",
    "corpus_dataset",
    "FIXTURE_EDGES",
    "fixture_edges_table",
    "parse_edgelist_text",
    "read_edgelist",
]
