"""centrality_gpu_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch re-expression of the *capabilities* of
``Goutam363/centrality-GPU`` (an exact betweenness-centrality C++/CUDA
program, see ``/root/reference/Codes``) as idiomatic Ray Data pipelines:

* a source-code corpus table ``(repo, path, commit, lang, content)`` is
  turned into a co-occurrence **edge table** (`stages/edges.py`),
* iterative graph algorithms — PageRank, connected components, label
  propagation, triangle counting, and a Brandes betweenness-centrality
  conformance tier — run as **supersteps**: one vectorized
  ``map_batches`` gather over the static edge Dataset, followed by a
  pre-aggregated (optionally salted two-level) ``groupby`` scatter
  (`pipelines/`),
* per-superstep Parquet checkpoints with lineage manifests make every
  run resumable (`state/checkpoint.py`),
* plus the training-data-pipeline operators a 100 TB corpus needs:
  exact/MinHash-LSH/SimHash dedup, ANN similarity search, text quality
  analysis, multimodal plumbing (`functions/`).

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned
by the caller (driver, tests' conftest, bench.py).
"""

from centrality_gpu_ray.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
