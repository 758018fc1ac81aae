"""Mesh construction, named shardings, and collective wrappers."""

from recsys_tpu.parallel.mesh import MeshContext, make_mesh
from recsys_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    rows_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "MeshContext",
    "batch_sharding",
    "replicated",
    "rows_sharding",
    "shard_batch",
]
