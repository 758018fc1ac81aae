"""Named collective wrappers (SURVEY §5.8).

The reference's communication backend is whatever NCCL all-reduce
``MirroredStrategy`` picks internally (``src/trainer.py:45-48``). Here
the backend is XLA collectives over ICI/DCN, reached through these named
wrappers so that higher layers (embedding engine, top-k merge, DP
gradient sync) never touch raw ``lax`` ops and CPU-mesh tests can
exercise them. All functions are meant to run inside ``jax.shard_map``
bodies (or under ``pjit`` where XLA inserts them automatically).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from recsys_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


# ---- DP gradient sync ---------------------------------------------------

def allreduce_mean(tree: Any, axis: str = DATA_AXIS) -> Any:
    """Mean-all-reduce a pytree over the data axis (DP gradient sync —
    the XLA/ICI replacement for MirroredStrategy's NCCL all-reduce)."""
    return jax.tree.map(lambda g: lax.pmean(g, axis), tree)


def allreduce_sum(tree: Any, axis: str = DATA_AXIS) -> Any:
    return jax.tree.map(lambda g: lax.psum(g, axis), tree)


# ---- model-axis exchange ------------------------------------------------

def gather_rows(x: jnp.ndarray, axis: str = MODEL_AXIS) -> jnp.ndarray:
    """All-gather shards along the leading dim (e.g. item-embedding
    shards -> full catalog)."""
    return lax.all_gather(x, axis, axis=0, tiled=True)


def exchange(x: jnp.ndarray, axis: str = MODEL_AXIS) -> jnp.ndarray:
    """All-to-all on the leading dim: shard i sends chunk j to shard j.

    ``x`` has shape ``(n_shards * cap, ...)``; the result has the same
    shape with chunk j replaced by the chunk received from shard j.
    This is the id/row exchange primitive of the sharded embedding
    lookup (SURVEY §2.3 "row-sharded embedding engine").
    """
    n = lax.axis_size(axis)
    parts = x.reshape((n, x.shape[0] // n) + x.shape[1:])
    swapped = lax.all_to_all(parts, axis, split_axis=0, concat_axis=0, tiled=False)
    return swapped.reshape(x.shape)


def ring_shift(x: jnp.ndarray, axis: str = MODEL_AXIS, shift: int = 1) -> jnp.ndarray:
    """ppermute ring rotation (blockwise catalog scoring, SURVEY §5.7)."""
    n = lax.axis_size(axis)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return lax.ppermute(x, axis, perm)


# ---- sharded top-k merge ------------------------------------------------

def merge_topk(
    scores: jnp.ndarray,
    ids: jnp.ndarray,
    k: int,
    axis: str = MODEL_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge per-shard top-k candidates into a global top-k.

    ``scores``/``ids``: per-shard candidates ``[..., k_local]`` with
    *global* ids. All-gathers the candidate sets over ``axis`` (k·S
    values, tiny vs the catalog) and re-selects the top ``k``.
    Replaces FAISS's single-host IndexFlatIP search
    (``src/trainer.py:236-248``, ``app/recommendation_service.py:72``).
    """
    all_scores = lax.all_gather(scores, axis, axis=-1, tiled=True)
    all_ids = lax.all_gather(ids, axis, axis=-1, tiled=True)
    top_scores, pos = lax.top_k(all_scores, k)
    top_ids = jnp.take_along_axis(all_ids, pos, axis=-1)
    return top_scores, top_ids


def axis_index(axis: str) -> jnp.ndarray:
    return lax.axis_index(axis)


def axis_size(axis: str) -> int:
    return lax.axis_size(axis)
