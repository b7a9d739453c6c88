from centrality_gpu_ray.pipelines.graph import Graph
from centrality_gpu_ray.pipelines.pagerank import pagerank
from centrality_gpu_ray.pipelines.components import connected_components
from centrality_gpu_ray.pipelines.labelprop import label_propagation
from centrality_gpu_ray.pipelines.triangles import (
    clustering_coefficients, edge_support, triangle_counts)
from centrality_gpu_ray.pipelines.truss import ktruss
from centrality_gpu_ray.pipelines.brandes import betweenness_centrality
from centrality_gpu_ray.pipelines.bc_decomp import betweenness_decomposed
from centrality_gpu_ray.pipelines.bicc import (articulation_points,
                                               bcc_labels, bridges)
from centrality_gpu_ray.pipelines.closeness import closeness_from_sources
from centrality_gpu_ray.pipelines.eigenvector import (eigenvector_centrality,
                                                      katz_centrality)
from centrality_gpu_ray.pipelines.linkpred import link_prediction
from centrality_gpu_ray.pipelines.hits import hits_fixed
from centrality_gpu_ray.pipelines.butterflies import butterfly_count
from centrality_gpu_ray.pipelines.mis import maximal_independent_set
from centrality_gpu_ray.pipelines.coloring import greedy_coloring
from centrality_gpu_ray.pipelines.gnn_sampling import neighbor_sample
from centrality_gpu_ray.pipelines.louvain import louvain, louvain_coarse
from centrality_gpu_ray.pipelines.subgraph import induced_subgraph
from centrality_gpu_ray.pipelines.community import (community_stats,
                                                    modularity_score)
from centrality_gpu_ray.pipelines.walks import random_walks, skipgram_pairs
from centrality_gpu_ray.pipelines.embeddings import (
    node2vec_embeddings, sgns_embeddings_dataset, sgns_train,
    sgns_train_sharded)

__all__ = [
    "Graph",
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_counts",
    "clustering_coefficients",
    "edge_support",
    "ktruss",
    "betweenness_centrality",
    "betweenness_decomposed",
    "articulation_points",
    "bcc_labels",
    "bridges",
    "closeness_from_sources",
    "eigenvector_centrality",
    "katz_centrality",
    "link_prediction",
    "hits_fixed",
    "butterfly_count",
    "maximal_independent_set",
    "greedy_coloring",
    "neighbor_sample",
    "louvain",
    "louvain_coarse",
    "induced_subgraph",
    "community_stats",
    "modularity_score",
    "random_walks",
    "skipgram_pairs",
    "node2vec_embeddings",
    "sgns_train",
    "sgns_train_sharded",
    "sgns_embeddings_dataset",
]
