"""Row-sharded embedding lookup engine (SURVEY §2.3).

The reference's embedding tables are fully replicated
(``keras.layers.Embedding`` under MirroredStrategy, ``src/models.py:71``).
At scale (BASELINE.json configs[4]: 100M-row tables) a table no longer
fits one chip, so rows are partitioned over the ``model`` mesh axis.
Three lookup strategies, all differentiable (the backward pass is the
gather transpose — a scatter-add into local rows — which JAX derives
automatically through ``shard_map``):

1. **XLA-partitioned** (default in the trainer): keep ``jnp.take`` under
   ``jit`` with the table sharded ``P('model', None)``; XLA's SPMD
   partitioner emits the collective gather. Zero code, good baseline.
2. **psum-gather** (:func:`make_sharded_lookup_psum`): every shard
   gathers the ids it owns (others masked to zero) and the results are
   summed over the axis. Communication: one psum of ``[B, D]`` —
   bandwidth-optimal when B·D is small and avoids host-side bucketing.
3. **all-to-all** (:func:`make_sharded_lookup_a2a`): ids are bucketed
   by owner shard into fixed-capacity bins (static shapes; overflow
   drops to the OOV row and is reported), exchanged with
   ``lax.all_to_all``, gathered locally, and exchanged back.
   Communication: 2 all-to-alls of ``[S·cap]`` ids + ``[S·cap, D]``
   rows — the scalable path when B >> capacity per shard
   (each id moves once instead of every shard touching every id).

CPU-mesh equivalence tests: ``tests/test_embed.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from recsys_tpu.parallel.mesh import MeshContext


def lookup_replicated(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Baseline replicated lookup (clip-to-OOV semantics of
    ``models.towers``)."""
    return jnp.take(table, jnp.clip(ids, 0, table.shape[0] - 1), axis=0)


def lookup_psum_inside(table_shard: jnp.ndarray, ids: jnp.ndarray,
                       axis: str) -> jnp.ndarray:
    """Masked-local-gather + psum lookup **body** — call from inside an
    enclosing ``shard_map`` whose mesh names ``axis`` (the trainer's
    SPMD step does; :func:`make_sharded_lookup_psum` wraps it for
    standalone use). Differentiable: the backward is the gather
    transpose (scatter-add into local rows) + the psum transpose
    (identity), derived by JAX automatically."""
    rows_per_shard = table_shard.shape[0]
    shard = lax.axis_index(axis)
    local = ids - shard * rows_per_shard
    own = (local >= 0) & (local < rows_per_shard)
    safe = jnp.clip(local, 0, rows_per_shard - 1)
    rows = jnp.take(table_shard, safe, axis=0)
    rows = jnp.where(own[:, None], rows, 0.0)
    return lax.psum(rows, axis)


def make_sharded_lookup_psum(ctx: MeshContext) -> Callable:
    """Masked-local-gather + psum lookup.

    Returns ``f(table_sharded [V, D], ids [B]) -> [B, D]`` jitted over
    the mesh; ``table`` must be row-sharded over ``model`` and ``ids``
    replicated along it (sharded over ``data`` is fine).
    """
    axis = ctx.model_axis

    def body(table_shard, ids):
        return lookup_psum_inside(table_shard, ids, axis)

    return jax.jit(
        jax.shard_map(
            body,
            mesh=ctx.mesh,
            in_specs=(P(ctx.model_axis, None), P(ctx.data_axis)),
            out_specs=P(ctx.data_axis, None),
            check_vma=False,
        )
    )


def lookup_a2a_inside(table_shard: jnp.ndarray, ids: jnp.ndarray,
                      axis: str, n: int, capacity: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Capacity-bucketed all-to-all lookup **body** — call from inside
    an enclosing ``shard_map`` (the trainer's SPMD step does;
    :func:`make_sharded_lookup_a2a` wraps it standalone).

    Returns ``(rows [B, D], overflow [])`` where overflow counts the
    local ids that exceeded their destination bucket's ``capacity`` and
    were served a zero row. Differentiable wrt ``table_shard``: the
    backward path is the gather transpose (scatter-add into local rows)
    threaded back through the two all-to-alls (each its own transpose).
    """
    rows_per_shard = table_shard.shape[0]
    owner = jnp.clip(ids // rows_per_shard, 0, n - 1)

    # Stable counting-rank instead of a sort (round 5): each id's
    # position within its owner bucket comes from a one-hot prefix sum
    # over the tiny shard axis — O(B·n) fully-parallel VPU work
    # replacing the O(B log B) argsort + searchsorted + inverse
    # scatter (which measured 177 µs of single-chip machinery at
    # B=4096/D=128; re-measured after this rewrite in scale.json
    # "a2a_overhead").
    one_hot = (owner[:, None] == jnp.arange(n)[None, :]).astype(jnp.int32)
    prefix = jnp.cumsum(one_hot, axis=0)  # inclusive counts [B, n]
    pos_in_owner = jnp.take_along_axis(prefix, owner[:, None],
                                       axis=1)[:, 0] - 1
    fits = pos_in_owner < capacity
    overflow = jnp.sum(~fits)

    # send buffer [n * capacity] of local row indices (+1, 0 = empty).
    # Overflowing ids are routed out of bounds and DROPPED by scatter
    # semantics — deterministic, and (unlike the sort-based version,
    # whose overflow writes raced a legitimate element for bucket
    # slot 0) it can never clobber a fitting request.
    slot = owner * capacity + pos_in_owner
    local_row = ids - owner * rows_per_shard
    send = jnp.zeros((n * capacity,), jnp.int32).at[
        jnp.where(fits, slot, n * capacity)
    ].set((local_row + 1).astype(jnp.int32), mode="drop")

    # exchange id requests: chunk j goes to shard j
    req = lax.all_to_all(
        send.reshape(n, capacity), axis, split_axis=0, concat_axis=0
    ).reshape(n * capacity)

    # serve local rows (0 = empty slot -> produce zeros)
    got = jnp.take(table_shard, jnp.clip(req - 1, 0, rows_per_shard - 1), axis=0)
    got = jnp.where((req > 0)[:, None], got, 0.0)

    # send results back
    back = lax.all_to_all(
        got.reshape(n, capacity, -1), axis, split_axis=0, concat_axis=0
    ).reshape(n * capacity, -1)

    # each original position reads its own slot straight back — the
    # sortless formulation needs no inverse scatter
    out = jnp.where(fits[:, None], back[jnp.where(fits, slot, 0)], 0.0)
    return out, overflow


def a2a_capacity(batch_per_shard: int, n_shards: int,
                 capacity_factor: float) -> int:
    """Per-destination bucket size for the all-to-all exchange
    (``MeshConfig.lookup_capacity_factor``): under a uniform id spread a
    batch of B ids sends ~B/S to each shard; the factor is headroom for
    skew. Rounded up to a multiple of 8 (sublane-friendly) and at least
    8."""
    import math

    cap = math.ceil(capacity_factor * batch_per_shard / max(n_shards, 1))
    return max(8, -(-cap // 8) * 8)


def make_sharded_lookup_a2a(ctx: MeshContext, capacity: int) -> Callable:
    """Capacity-bucketed all-to-all lookup.

    ``capacity`` = max ids any (shard -> shard) bucket can carry per
    call (static). Overflowing ids fall back to row 0 of the owner and
    an overflow count is returned — size capacity via
    ``MeshConfig.lookup_capacity_factor * B / n_shards``.

    Returns ``f(table_sharded, ids) -> (rows [B, D], overflow [])``.
    """
    axis = ctx.model_axis
    n = ctx.n_model

    def body(table_shard, ids):
        out, overflow = lookup_a2a_inside(table_shard, ids, axis, n, capacity)
        # total overflow across the data axis (identical on model replicas)
        return out, lax.psum(overflow, ctx.data_axis)

    f = jax.shard_map(
        body,
        mesh=ctx.mesh,
        in_specs=(P(ctx.model_axis, None), P(ctx.data_axis)),
        out_specs=(P(ctx.data_axis, None), P()),
        check_vma=False,
    )
    return jax.jit(f)
