"""Flash in-batch sampled-softmax cross-entropy (Pallas TPU kernel).

The retrieval loss's [B, B] logits matrix dominates the train step at
large batch (at B=16k it is ~1 GB fp32; the XLA path spends ~5 HBM
passes on it). This kernel computes

    ce_i = logsumexp_j(u_i . v_j + colcorr_j + accidental_mask) - s_ii

with flash-attention-style tiling: per query tile, candidate tiles are
swept with an online (max, sumexp) accumulator held in VMEM scratch —
the full logits matrix never exists in HBM. The backward pass is two
more kernels (dU with query-major grid, dV/dcol with candidate-major
grid) that recompute tile logits from the saved per-row LSE.

Semantics match ``losses.in_batch_softmax`` (single-replica path):
``colcorr = item_bias - log_q`` per candidate column, accidental-hit
masking via ``item_ids`` (duplicate columns are -inf'd except the
diagonal), diagonal labels.

All per-row vectors travel as [1, B] (lane-major) blocks — Mosaic
requires 1-D operands to be whole-array blocks, so 2-D it is.
Tiles: 512x512 fp32 scores = 1 MB VMEM; d is a lane multiple (128).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e9


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _tile(b: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if b % t == 0:
            return t
    return b


def _logits_tile(u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref, i, j, tq, tk):
    """Shared tile-logits computation: dot + colcorr + accidental mask."""
    s = jax.lax.dot_general(
        u_ref[:], v_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + corr_ref[0, :].reshape(1, tk)
    row_g = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    col_g = j * tk + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    accidental = (
        ids_q_ref[0, :].reshape(tq, 1) == ids_k_ref[0, :].reshape(1, tk)
    ) & (row_g != col_g)
    s = jnp.where(accidental, NEG_BIG, s)
    return s, row_g, col_g


# ---------------- forward -------------------------------------------------

def _fwd_kernel(u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref,
                lse_ref, pos_ref, m_scr, l_scr, pos_scr):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    tq = u_ref.shape[0]
    tk = v_ref.shape[0]

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_BIG)
        l_scr[:] = jnp.zeros_like(l_scr)
        pos_scr[:] = jnp.zeros_like(pos_scr)

    s, row_g, col_g = _logits_tile(
        u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref, i, j, tq, tk
    )

    # positive (diagonal) logit if it lives in this tile
    is_diag = row_g == col_g
    pos_scr[0, :] += jnp.sum(jnp.where(is_diag, s, 0.0), axis=1)

    # online logsumexp
    m_prev = m_scr[0, :]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
    l_scr[0, :] = (
        l_scr[0, :] * jnp.exp(m_prev - m_new)
        + jnp.sum(jnp.exp(s - m_new[:, None]), axis=1)
    )
    m_scr[0, :] = m_new

    @pl.when(j == n_j - 1)
    def _():
        lse_ref[0, :] = m_scr[0, :] + jnp.log(jnp.maximum(l_scr[0, :], 1e-30))
        pos_ref[0, :] = pos_scr[0, :]


def _flash_fwd_raw(u, v, colcorr, ids, interpret):
    b, d = u.shape
    tq = tk = _tile(b)
    grid = (b // tq, b // tk)
    lse, pos = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, b), jnp.float32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tq), jnp.float32),
            pltpu.VMEM((1, tq), jnp.float32),
            pltpu.VMEM((1, tq), jnp.float32),
        ],
        interpret=interpret,
    )(u, v, colcorr.reshape(1, b), ids.reshape(1, b), ids.reshape(1, b))
    return lse[0], pos[0]


# ---------------- backward ------------------------------------------------

def _bwd_du_kernel(u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref,
                   lse_ref, g_ref, du_ref, acc_scr):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    tq = u_ref.shape[0]
    tk = v_ref.shape[0]

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s, _, _ = _logits_tile(
        u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref, i, j, tq, tk
    )
    p = jnp.exp(s - lse_ref[0, :].reshape(tq, 1))
    pg = p * g_ref[0, :].reshape(tq, 1)
    acc_scr[:] += jax.lax.dot_general(
        pg, v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_j - 1)
    def _():
        du_ref[:] = acc_scr[:]


def _bwd_dv_kernel(u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref,
                   lse_ref, g_ref, dv_ref, dcol_ref, acc_scr, col_scr):
    # grid (j, i): candidate tile j is the output block, sweep query tiles
    j = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    tq = u_ref.shape[0]
    tk = v_ref.shape[0]

    @pl.when(i == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        col_scr[:] = jnp.zeros_like(col_scr)

    s, _, _ = _logits_tile(
        u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref, i, j, tq, tk
    )
    p = jnp.exp(s - lse_ref[0, :].reshape(tq, 1))
    pg = p * g_ref[0, :].reshape(tq, 1)
    # dV_j += P^T (g*U)
    acc_scr[:] += jax.lax.dot_general(
        pg, u_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col_scr[0, :] += jnp.sum(pg, axis=0)

    @pl.when(i == n_i - 1)
    def _():
        dv_ref[:] = acc_scr[:]
        dcol_ref[0, :] = col_scr[0, :]


def _flash_bwd_raw(u, v, colcorr, ids, lse, g, interpret):
    b, d = u.shape
    tq = tk = _tile(b)
    corr2 = colcorr.reshape(1, b)
    ids2 = ids.reshape(1, b)
    lse2 = lse.reshape(1, b)
    g2 = g.reshape(1, b)
    du = pl.pallas_call(
        _bwd_du_kernel,
        grid=(b // tq, b // tk),
        in_specs=[
            pl.BlockSpec((tq, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tq, d), jnp.float32)],
        interpret=interpret,
    )(u, v, corr2, ids2, ids2, lse2, g2)

    dv, dcol = pl.pallas_call(
        _bwd_dv_kernel,
        grid=(b // tk, b // tq),
        in_specs=[
            pl.BlockSpec((tq, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda j, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tk, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, d), jnp.float32),
            pltpu.VMEM((1, tk), jnp.float32),
        ],
        interpret=interpret,
    )(u, v, corr2, ids2, ids2, lse2, g2)
    return du, dv, dcol[0]


# ---------------- custom-vjp wrapper --------------------------------------

@jax.custom_vjp
def flash_softmax_ce(u, v, colcorr, ids):
    """Per-row CE [B] = lse_i - s_ii of the corrected, accidental-masked
    in-batch logits. Differentiable w.r.t. u, v, colcorr."""
    ce, _ = _flash_ce_fwd(u, v, colcorr, ids)
    return ce


def _flash_ce_fwd(u, v, colcorr, ids):
    # inputs may be bf16 (MXU-native); every reduction/accumulation
    # inside the kernels is fp32 via preferred_element_type
    interpret = not _on_tpu()
    lse, pos = _flash_fwd_raw(u, v, colcorr, ids, interpret)
    ce = lse - pos
    return ce, (u, v, colcorr, ids, lse)


def _flash_ce_bwd(saved, g):
    u_in, v_in, colcorr, ids, lse = saved
    interpret = not _on_tpu()
    du_sm, dv_sm, dcol = _flash_bwd_raw(
        u_in, v_in, colcorr, ids, lse, g, interpret
    )
    # diagonal (label) terms: d/du_i of (-s_ii) = -g_i v_i, and symmetric
    du = du_sm - g[:, None] * v_in.astype(jnp.float32)
    dv = dv_sm - g[:, None] * u_in.astype(jnp.float32)
    dcol = dcol - g
    return du.astype(u_in.dtype), dv.astype(v_in.dtype), dcol, None


flash_softmax_ce.defvjp(_flash_ce_fwd, _flash_ce_bwd)


def in_batch_softmax_flash(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    item_ids: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    log_q: Optional[jnp.ndarray] = None,
    item_bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Drop-in equivalent of ``losses.in_batch_softmax`` (single-replica
    path) backed by the flash kernel."""
    b = user_emb.shape[0]
    colcorr = jnp.zeros((b,), jnp.float32)
    if item_bias is not None:
        colcorr = colcorr + item_bias
    if log_q is not None:
        colcorr = colcorr - log_q
    ce = flash_softmax_ce(user_emb, item_emb, colcorr, item_ids)
    if mask is not None:
        return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(ce)
