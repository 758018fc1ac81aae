"""Embedding engine: replicated and row-sharded table lookups."""

from recsys_tpu.embed.table import (
    lookup_replicated,
    make_sharded_lookup_a2a,
    make_sharded_lookup_psum,
)

__all__ = [
    "lookup_replicated",
    "make_sharded_lookup_psum",
    "make_sharded_lookup_a2a",
]
