from centrality_gpu_ray.state.checkpoint import (
    CheckpointManager,
    write_checkpoint,
    latest_checkpoint,
)

__all__ = ["CheckpointManager", "write_checkpoint", "latest_checkpoint"]
