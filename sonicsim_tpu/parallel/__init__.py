from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .pipeline import pad_moving_plans, render_mixture_sources

__all__ = [
    "batch_sharding",
    "make_mesh",
    "pad_moving_plans",
    "render_mixture_sources",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
