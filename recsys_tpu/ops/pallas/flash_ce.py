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

Semantics match ``losses.in_batch_softmax``:
``colcorr = item_bias - log_q`` per candidate column, accidental-hit
masking via ``item_ids`` (duplicate columns are -inf'd except the
row's positive column), per-row positive-column labels.

The kernels are **rectangular**: ``[Bq, D]`` local query rows against
``[Bk, D]`` candidates with an explicit positive column per row —
``Bk = Bq`` with ``pos = arange`` recovers the square in-batch case,
and ``Bk = n_data * Bq`` with ``pos = axis_index * Bq + arange`` is the
**global-negatives** case (candidates all-gathered over the data axis
inside the SPMD step; the all_gather stays OUTSIDE the custom_vjp so
its reduce-scatter transpose is handled by autodiff). This closes the
round-2 gap where flash was gated off exactly in the B>=128k
cross-batch regime that needs it (``multitask.py``; SURVEY §7.3).

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


from recsys_tpu.utils.platform import on_tpu as _on_tpu  # noqa: E402


def _tile(b: int, pref: int = 512) -> int:
    for t in (pref, 512, 256, 128, 64, 32, 16, 8):
        if t <= pref and b % t == 0:
            return t
    return b


# Preferred (query, candidate) tile sizes. Tuned on v5e at B=128k:
# the per-grid-step overhead (block DMA turnaround + sequencing)
# dominates a [512, 512, 128] tile's 0.34 us of bf16 MXU work, so
# bigger tiles win until VMEM runs out — (1024, 2048) fits (8 MB fp32
# scores + double-buffered operand blocks) and cuts the grid 8x.
_TQ_PREF = 1024
_TK_PREF = 2048


def _tiles(bq: int, bk: int) -> Tuple[int, int]:
    tq, tk = _tile(bq, _TQ_PREF), _tile(bk, _TK_PREF)
    # keep the fp32 score tile under ~8 MB of VMEM — but only shrink to
    # tiles that still DIVIDE bq: grid = bq // tq silently drops the
    # trailing rows otherwise (their lse/CE blocks are never written)
    while (tq * tk * 4 > 8 * 1024 * 1024 and tq > 512
           and bq % (tq // 2) == 0):
        tq //= 2
    assert bq % tq == 0 and bk % tk == 0, (
        f"flash-CE tiling must cover the batch exactly: "
        f"bq={bq} tq={tq} bk={bk} tk={tk}")
    return tq, tk


def _vma(*xs) -> frozenset:
    """Union of the inputs' varying-manual-axes: under a
    ``check_vma=True`` shard_map (the trainer's SPMD step), pallas_call
    out_shapes must declare which mesh axes the outputs vary over —
    any output varies over every axis some input varies over."""
    out = frozenset()
    for x in xs:
        out = out | getattr(jax.typeof(x), "vma", frozenset())
    return out


def _logits_tile(u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref, pos_ref,
                 i, j, tq, tk):
    """Shared tile-logits computation: dot + colcorr + accidental mask.
    ``pos_ref`` [1, tq] holds each row's positive GLOBAL column index;
    ``is_pos`` marks where that column lands in this tile."""
    s = jax.lax.dot_general(
        u_ref[:], v_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + corr_ref[0, :].reshape(1, tk)
    col_g = j * tk + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    is_pos = col_g == pos_ref[0, :].reshape(tq, 1)
    accidental = (
        ids_q_ref[0, :].reshape(tq, 1) == ids_k_ref[0, :].reshape(1, tk)
    ) & jnp.logical_not(is_pos)
    s = jnp.where(accidental, NEG_BIG, s)
    return s, is_pos


# ---------------- forward -------------------------------------------------

def _fwd_kernel(u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref, posidx_ref,
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

    s, is_pos = _logits_tile(
        u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref, posidx_ref, i, j, tq, tk
    )

    # positive-column logit if it lives in this candidate tile
    pos_scr[0, :] += jnp.sum(jnp.where(is_pos, s, 0.0), axis=1)

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


def _flash_fwd_raw(u, v, colcorr, ids_q, ids_k, pos_idx, interpret):
    bq, d = u.shape
    bk = v.shape[0]
    tq, tk = _tiles(bq, bk)
    vma = _vma(u, v, colcorr, ids_q, ids_k, pos_idx)
    grid = (bq // tq, bk // tk)
    lse, pos = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, bq), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, bq), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tq), jnp.float32),
            pltpu.VMEM((1, tq), jnp.float32),
            pltpu.VMEM((1, tq), jnp.float32),
        ],
        interpret=interpret,
    )(u, v, colcorr.reshape(1, bk), ids_q.reshape(1, bq),
      ids_k.reshape(1, bk), pos_idx.reshape(1, bq))
    return lse[0], pos[0]


# ---------------- backward ------------------------------------------------

def _bwd_du_kernel(u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref, posidx_ref,
                   lse_ref, g_ref, du_ref, acc_scr):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    tq = u_ref.shape[0]
    tk = v_ref.shape[0]

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s, _ = _logits_tile(
        u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref, posidx_ref, i, j, tq, tk
    )
    p = jnp.exp(s - lse_ref[0, :].reshape(tq, 1))
    pg = p * g_ref[0, :].reshape(tq, 1)
    # match the input precision on the MXU: with bf16 u/v the pg matmul
    # in fp32 would run at the MXU's ~4x-slower fp32 rate and dominate
    # the backward (accumulation stays fp32 via preferred_element_type)
    acc_scr[:] += jax.lax.dot_general(
        pg.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_j - 1)
    def _():
        du_ref[:] = acc_scr[:]


def _bwd_dv_kernel(u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref, posidx_ref,
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

    s, _ = _logits_tile(
        u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref, posidx_ref, i, j, tq, tk
    )
    p = jnp.exp(s - lse_ref[0, :].reshape(tq, 1))
    pg = p * g_ref[0, :].reshape(tq, 1)
    # dV_j += P^T (g*U) — pg cast to the input precision (see dU kernel)
    acc_scr[:] += jax.lax.dot_general(
        pg.astype(u_ref.dtype), u_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col_scr[0, :] += jnp.sum(pg, axis=0)

    @pl.when(i == n_i - 1)
    def _():
        dv_ref[:] = acc_scr[:]
        dcol_ref[0, :] = col_scr[0, :]


def _bwd_fused_kernel(u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref,
                      posidx_ref, lse_ref, g_ref, dv_ref, dcol_ref, dup_ref,
                      acc_scr, col_scr):
    """Single-sweep backward: candidate-major grid (j, i) accumulates
    dV_j/dcol_j in scratch (as ``_bwd_dv_kernel``) AND emits the dU
    partial for (query tile i, candidate tile j) to HBM — the logits
    tile and its exp are computed ONCE instead of once per output.
    The [n_j, Bq, D] partials are summed over j by XLA outside; that
    costs one extra HBM round-trip of Bq*D*n_j fp32 but removes a full
    B*B logits recompute + exp pass + a kernel launch's grid overhead
    (the exp passes are the VPU-bound kernel's dominant cost)."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    tq = u_ref.shape[0]
    tk = v_ref.shape[0]

    @pl.when(i == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        col_scr[:] = jnp.zeros_like(col_scr)

    s, _ = _logits_tile(
        u_ref, v_ref, corr_ref, ids_q_ref, ids_k_ref, posidx_ref, i, j, tq, tk
    )
    p = jnp.exp(s - lse_ref[0, :].reshape(tq, 1))
    # keep an fp32 pg for the column sum so the item_bias/log_q gradient
    # matches the two-kernel path bit-for-bit across the partials-cap
    # threshold; only the MXU matmul operands are cast down
    pg32 = p * g_ref[0, :].reshape(tq, 1)
    pg = pg32.astype(u_ref.dtype)
    acc_scr[:] += jax.lax.dot_general(
        pg, u_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col_scr[0, :] += jnp.sum(pg32, axis=0)
    dup_ref[0, :, :] = jax.lax.dot_general(
        pg, v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_i - 1)
    def _():
        dv_ref[:] = acc_scr[:]
        dcol_ref[0, :] = col_scr[0, :]


# above this many bytes of dU partials, fall back to the two-kernel
# backward (partials scale as Bq * D * (Bk / tk)). ADVICE r3 flagged
# the untested 6 GiB cap as an OOM hazard at the flagship B=128k
# square regime (~4.3 GiB of partials); round 4 MEASURED that regime
# on the 16 GiB v5e: the fused path runs the FULL train step at
# B=128k square without OOM and 1.12x faster than two-kernel (217.0
# vs 243.6 ms, 604k ex/s — kernels_tpu.json train_step_flash), and
# the backward alone is 1.25x (116.2 vs 145.8 ms). Cap set to 4.5 GiB:
# admits 128k square with measured headroom, still refuses layouts
# whose partials alone would crowd a 16 GiB part.
_FUSED_BWD_PARTIALS_CAP = int(4.5 * 1024**3)


def _flash_bwd_fused_raw(u, v, colcorr, ids_q, ids_k, pos_idx, lse, g,
                         interpret):
    bq, d = u.shape
    bk = v.shape[0]
    tq, tk = _tiles(bq, bk)
    n_j = bk // tk
    vma = _vma(u, v, colcorr, ids_q, ids_k, pos_idx, lse, g)
    dv, dcol, du_part = pl.pallas_call(
        _bwd_fused_kernel,
        grid=(n_j, bq // tq),
        in_specs=[
            pl.BlockSpec((tq, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda j, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tk, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, d), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bk, d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, bk), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((n_j, bq, d), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, d), jnp.float32),
            pltpu.VMEM((1, tk), jnp.float32),
        ],
        interpret=interpret,
    )(u, v, colcorr.reshape(1, bk), ids_q.reshape(1, bq),
      ids_k.reshape(1, bk), pos_idx.reshape(1, bq),
      lse.reshape(1, bq), g.reshape(1, bq))
    return jnp.sum(du_part, axis=0), dv, dcol[0]


def _flash_bwd_raw(u, v, colcorr, ids_q, ids_k, pos_idx, lse, g, interpret):
    bq, d = u.shape
    bk = v.shape[0]
    _, tk = _tiles(bq, bk)
    if bq * d * (bk // tk) * 4 <= _FUSED_BWD_PARTIALS_CAP:
        return _flash_bwd_fused_raw(
            u, v, colcorr, ids_q, ids_k, pos_idx, lse, g, interpret)
    return _flash_bwd_twokernel_raw(
        u, v, colcorr, ids_q, ids_k, pos_idx, lse, g, interpret)


def _flash_bwd_twokernel_raw(u, v, colcorr, ids_q, ids_k, pos_idx, lse, g,
                             interpret):
    bq, d = u.shape
    bk = v.shape[0]
    tq, tk = _tiles(bq, bk)
    vma = _vma(u, v, colcorr, ids_q, ids_k, pos_idx, lse, g)
    corr2 = colcorr.reshape(1, bk)
    idsq2 = ids_q.reshape(1, bq)
    idsk2 = ids_k.reshape(1, bk)
    pos2 = pos_idx.reshape(1, bq)
    lse2 = lse.reshape(1, bq)
    g2 = g.reshape(1, bq)
    du = pl.pallas_call(
        _bwd_du_kernel,
        grid=(bq // tq, bk // tk),
        in_specs=[
            pl.BlockSpec((tq, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bq, d), jnp.float32, vma=vma),
        scratch_shapes=[pltpu.VMEM((tq, d), jnp.float32)],
        interpret=interpret,
    )(u, v, corr2, idsq2, idsk2, pos2, lse2, g2)

    dv, dcol = pl.pallas_call(
        _bwd_dv_kernel,
        grid=(bk // tk, bq // tq),
        in_specs=[
            pl.BlockSpec((tq, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda j, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tk, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bk, d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, bk), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, d), jnp.float32),
            pltpu.VMEM((1, tk), jnp.float32),
        ],
        interpret=interpret,
    )(u, v, corr2, idsq2, idsk2, pos2, lse2, g2)
    return du, dv, dcol[0]


# ---------------- custom-vjp wrapper --------------------------------------

@jax.custom_vjp
def flash_softmax_ce(u, v, colcorr, ids_q, ids_k, pos_idx):
    """Per-row CE [Bq] = lse_i - s_{i,pos_i} of the corrected,
    accidental-masked logits of ``u [Bq, D]`` against candidates
    ``v [Bk, D]``. Differentiable w.r.t. u, v, colcorr."""
    ce, _ = _flash_ce_fwd(u, v, colcorr, ids_q, ids_k, pos_idx)
    return ce


def _dense_masked_logits(u, v, colcorr, ids_q, ids_k, pos_idx):
    s = jax.lax.dot_general(
        u, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) + colcorr[None, :]
    col = jnp.arange(v.shape[0], dtype=jnp.int32)
    accidental = (ids_q[:, None] == ids_k[None, :]) & (
        col[None, :] != pos_idx[:, None]
    )
    return jnp.where(accidental, NEG_BIG, s)


def _dense_ref_fwd(u, v, colcorr, ids_q, ids_k, pos_idx):
    """Pure-jnp twin of the fwd kernel — used ONLY in interpret mode
    inside a check_vma shard_map, where the pallas HLO interpreter's
    internal dynamic_slices mix varying and invariant operands and trip
    the vma checker (a CPU-test-harness limitation; on TPU the kernel
    compiles under shard_map with the vma declared on its out_shapes)."""
    s = _dense_masked_logits(u, v, colcorr, ids_q, ids_k, pos_idx)
    lse = jax.nn.logsumexp(s, axis=-1)
    pos = jnp.take_along_axis(s, pos_idx[:, None], axis=1)[:, 0]
    return lse, pos


def _dense_ref_bwd(u, v, colcorr, ids_q, ids_k, pos_idx, lse, g):
    """Pure-jnp twin of the bwd kernels (softmax part, pre-label-term)."""
    s = _dense_masked_logits(u, v, colcorr, ids_q, ids_k, pos_idx)
    p = jnp.exp(s - lse[:, None])
    pg = p * g[:, None]
    du = jax.lax.dot_general(
        pg, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dv = jax.lax.dot_general(
        pg, u, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return du, dv, jnp.sum(pg, axis=0)


def _use_dense_ref(*xs) -> bool:
    return (not _on_tpu()) and bool(_vma(*xs))


def _flash_ce_fwd(u, v, colcorr, ids_q, ids_k, pos_idx):
    # inputs may be bf16 (MXU-native); every reduction/accumulation
    # inside the kernels is fp32 via preferred_element_type
    interpret = not _on_tpu()
    if _use_dense_ref(u, v, colcorr, ids_q, ids_k, pos_idx):
        lse, pos = _dense_ref_fwd(u, v, colcorr, ids_q, ids_k, pos_idx)
    else:
        lse, pos = _flash_fwd_raw(
            u, v, colcorr, ids_q, ids_k, pos_idx, interpret)
    ce = lse - pos
    return ce, (u, v, colcorr, ids_q, ids_k, pos_idx, lse)


def _flash_ce_bwd(saved, g):
    u_in, v_in, colcorr, ids_q, ids_k, pos_idx, lse = saved
    interpret = not _on_tpu()
    if _use_dense_ref(u_in, v_in, colcorr, ids_q, ids_k, pos_idx, lse, g):
        du_sm, dv_sm, dcol = _dense_ref_bwd(
            u_in, v_in, colcorr, ids_q, ids_k, pos_idx, lse, g)
    else:
        du_sm, dv_sm, dcol = _flash_bwd_raw(
            u_in, v_in, colcorr, ids_q, ids_k, pos_idx, lse, g, interpret
        )
    # positive-column (label) terms: d/du_i of (-s_{i,pos_i}) =
    # -g_i v_{pos_i}, and the scatter-symmetric dv/dcol corrections
    # (pos_idx columns are unique by construction, so .at[].add has
    # no duplicate-combining subtleties)
    v_pos = jnp.take(v_in.astype(jnp.float32), pos_idx, axis=0)
    du = du_sm - g[:, None] * v_pos
    dv = dv_sm.at[pos_idx].add(-g[:, None] * u_in.astype(jnp.float32))
    dcol = dcol.at[pos_idx].add(-g)
    return (du.astype(u_in.dtype), dv.astype(v_in.dtype), dcol,
            None, None, None)


flash_softmax_ce.defvjp(_flash_ce_fwd, _flash_ce_bwd)


def in_batch_softmax_flash(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    item_ids: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    log_q: Optional[jnp.ndarray] = None,
    item_bias: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    bf16: "bool | str" = "auto",
    extra_candidates=None,
) -> jnp.ndarray:
    """Drop-in equivalent of ``losses.in_batch_softmax`` backed by the
    flash kernel. With ``axis_name`` set (inside ``shard_map``), the
    candidate set is the item block all-gathered over that axis —
    cross-batch (global) negatives; the positive column of local row i
    is ``axis_index * B_local + i``. The all_gather sits outside the
    custom_vjp, so its transpose (reduce-scatter of the dv cotangent)
    is ordinary autodiff — the kernel itself stays single-device.

    ``bf16`` mirrors ``losses.in_batch_softmax``'s bf16-logits policy
    for the MXU operands: ``"auto"`` casts u/v to bfloat16 when the
    candidate count is >= 8192 (the same threshold where bf16 logits
    win on the XLA path; all reductions stay fp32 inside the kernel).
    On the v5e MXU fp32 matmuls run at ~1/4 the bf16 rate, and this
    kernel is matmul-bound — 5 B*B*D dots per fwd+bwd."""
    b = user_emb.shape[0]
    n_cand = user_emb.shape[0] * (
        1 if axis_name is None else jax.lax.psum(1, axis_name)
    )
    if extra_candidates is not None:
        # the cache extends the candidate axis — count it, so shapes
        # the 'auto' path policy routed here BECAUSE of the cache also
        # cross the bf16 threshold (the kernel is matmul-bound on the
        # full candidate axis)
        n_cand = n_cand + extra_candidates[0].shape[0]
    if bf16 is True or (bf16 == "auto" and n_cand >= 8192):
        user_emb = user_emb.astype(jnp.bfloat16)
        item_emb = item_emb.astype(jnp.bfloat16)
    colcorr = jnp.zeros((b,), jnp.float32)
    if item_bias is not None:
        colcorr = colcorr + item_bias
    if log_q is not None:
        colcorr = colcorr - log_q
    if axis_name is None:
        cand, cand_ids, cand_corr = item_emb, item_ids, colcorr
        pos_idx = jnp.arange(b, dtype=jnp.int32)
    else:
        from jax import lax

        cand = lax.all_gather(item_emb, axis_name, axis=0, tiled=True)
        cand_ids = lax.all_gather(item_ids, axis_name, axis=0, tiled=True)
        cand_corr = lax.all_gather(colcorr, axis_name, axis=0, tiled=True)
        pos_idx = (
            jnp.arange(b, dtype=jnp.int32)
            + lax.axis_index(axis_name).astype(jnp.int32) * b
        )
    if extra_candidates is not None:
        # CBNS cross-batch negative cache (see losses.in_batch_softmax):
        # the kernel is rectangular already — the cache just extends the
        # candidate axis; positives stay in the first segment
        x_emb, x_ids, x_corr = extra_candidates
        cand = jnp.concatenate(
            [cand, jax.lax.stop_gradient(x_emb).astype(cand.dtype)]
        )
        cand_ids = jnp.concatenate([cand_ids, x_ids])
        cand_corr = jnp.concatenate([cand_corr,
                                     x_corr.astype(jnp.float32)])
    ce = flash_softmax_ce(user_emb, cand, cand_corr, item_ids, cand_ids,
                          pos_idx)
    if mask is not None:
        return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(ce)
