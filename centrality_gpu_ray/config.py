"""Engine configuration.

The reference exposes only three booleans (``use_cpu / use_gpu /
remove_pendants``, ``modified_apsp.h:32-35``) and compile-time constants
(``WORK_UNIT_SIZE`` etc., ``modified_apsp.cpp:32-33``). The new engine
makes the knobs explicit and runtime-configurable (SURVEY.md §2.8).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    """Knobs shared by all pipelines.

    Attributes:
        damping: PageRank damping factor (alpha).
        tolerance: L1 convergence threshold for iterative algorithms.
        max_supersteps: hard cap on superstep count.
        batch_size: rows per ``map_batches`` batch in the gather stage.
        num_partitions: target partition count for shuffles / edge layout.
        salt_buckets: number of salt buckets for the two-level hub
            aggregation (``groupby((key, salt)) -> groupby(key)``); 0
            disables salting.
        hub_degree_threshold: vertices with degree above this are
            considered hubs (reporting / diagnostics; the two-level
            aggregate itself is degree-oblivious and always safe).
        combine: how distributed-mode supersteps merge per-block partial
            messages: ``"owners"`` (default — Pregel-style: vertex-range
            owner actors hold resident state chunks and combine shard
            partials in parallel; zero O(n) driver work per superstep),
            ``"driver"`` (deterministic sorted driver-side segmented
            add), or ``"shuffle"`` (salted two-level groupby aggregate —
            the fully-Dataset-shaped route, also the salting test
            surface).
        dense_vertex_limit: graphs with at most this many vertices use
            the dense-vector fast path (driver-held float64/int64 numpy
            state, broadcast by ``ray.put`` per superstep — one
            object-store copy per node on a real cluster). Larger
            graphs use the fully-sharded sparse path.
        checkpoint_dir: directory for per-superstep Parquet checkpoints
            + lineage manifests; None disables checkpointing.
        checkpoint_every: checkpoint every k-th superstep.
        strict_convergence: raise when a fixpoint algorithm (CC, label
            propagation) hits ``max_supersteps`` with labels still
            changing, instead of silently returning unconverged results;
            False downgrades to a warning + ``converged=False`` metric.
    """

    damping: float = 0.85
    tolerance: float = 1e-6
    max_supersteps: int = 100
    batch_size: int = 262_144
    num_partitions: int = 16
    salt_buckets: int = 8
    combine: str = "owners"
    hub_degree_threshold: int = 1 << 16
    dense_vertex_limit: int = 5_000_000
    checkpoint_dir: str | None = None
    checkpoint_every: int = 1
    strict_convergence: bool = True
    # direction-optimizing BFS (Beamer α/β, reference
    # bcc_bfs.cpp:542-567): small frontiers gather from their own
    # adjacency segments instead of streaming all 2m messages. False
    # forces the full-scan mode everywhere (bench A/B + debugging).
    bfs_direction_opt: bool = True
    extra: dict = field(default_factory=dict)


DEFAULT_CONFIG = EngineConfig()
