"""Fused DCN cross-layer stack as a Pallas TPU kernel.

Computes the reference's rank-1 cross recurrence
``x_{l+1} = x0 * (x_l . w_l) + b_l + x_l`` (``src/models.py:40-44``)
for all L layers in ONE kernel launch: x0 and the running x_l stay in
VMEM across layers instead of round-tripping to HBM per layer (the XLA
path materializes each x_l). Forward saves the per-layer inputs as
residuals; the backward pass is a second Pallas kernel implementing the
hand-derived VJP:

    s_l      = x_l . w_l                  (per-row scalar)
    t_l      = g_{l+1} . x0               (per-row scalar)
    dw_l     = sum_rows t_l * x_l
    db_l     = sum_rows g_{l+1}
    dx0     += sum_l g_{l+1} * s_l        (accumulated across layers)
    g_l      = g_{l+1} + t_l * w_l        (carried down)

XLA reference path: ``recsys_tpu.models.dcn.DeepCrossNetwork``. The two
are equivalence-tested in ``tests/test_ops.py`` (interpret mode on the
CPU CI mesh) and compiled-for-real by ``benchmarks/kernel_check.py`` —
run on hardware via ``RECSYS_TPU_KERNEL_TEST=1 pytest
tests/test_ops.py::test_kernels_compiled_on_accelerator``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _fwd_kernel(x0_ref, w_ref, b_ref, out_ref, resid_ref):
    """Grid over batch tiles. w/b: [L, d]; resid: per-layer x_l inputs
    [L, T, d] for the backward pass."""
    x0 = x0_ref[:]
    xl = x0
    n_layers = w_ref.shape[0]
    for l in range(n_layers):
        resid_ref[l, :, :] = xl
        w = w_ref[l, :]
        s = jnp.sum(xl * w[None, :], axis=1, keepdims=True)  # [T, 1]
        xl = x0 * s + b_ref[l, :][None, :] + xl
    out_ref[:] = xl


def _bwd_kernel(x0_ref, w_ref, resid_ref, g_ref,
                dx0_ref, dw_ref, db_ref):
    """One grid step per batch tile; dw/db accumulated across tiles."""
    tile = pl.program_id(0)
    x0 = x0_ref[:]
    g = g_ref[:]
    n_layers = w_ref.shape[0]

    @pl.when(tile == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dx0 = jnp.zeros_like(x0)
    for l in range(n_layers - 1, -1, -1):
        xl = resid_ref[l, :, :]
        w = w_ref[l, :]
        s = jnp.sum(xl * w[None, :], axis=1, keepdims=True)
        t = jnp.sum(g * x0, axis=1, keepdims=True)
        dw_ref[l, :] += jnp.sum(t * xl, axis=0)
        db_ref[l, :] += jnp.sum(g, axis=0)
        dx0 = dx0 + g * s
        g = g + t * w[None, :]
    # at layer 0 the carried g is dL/dx0 through the residual/x_l path
    dx0_ref[:] = dx0 + g


def _tile_rows(n: int) -> int:
    for t in (256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return n


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def dcn_cross_fused(x0: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    out, _ = _dcn_cross_fwd(x0, w, b)
    return out


def _call_fwd(x0, w, b, interpret):
    n, d = x0.shape
    L = w.shape[0]
    t = _tile_rows(n)
    grid = (n // t,)
    out, resid = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, t, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x0.dtype),
            jax.ShapeDtypeStruct((L, n, d), x0.dtype),
        ],
        interpret=interpret,
    )(x0, w, b)
    return out, resid


def _dcn_cross_fwd(x0, w, b):
    interpret = not _on_tpu()
    out, resid = _call_fwd(x0, w, b, interpret)
    return out, (x0, w, resid)


def _dcn_cross_bwd(saved, g):
    x0, w, resid = saved
    interpret = not _on_tpu()
    n, d = x0.shape
    L = w.shape[0]
    t = _tile_rows(n)
    grid = (n // t,)
    dx0, dw, db = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, t, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x0.dtype),
            jax.ShapeDtypeStruct((L, d), jnp.float32),
            jax.ShapeDtypeStruct((L, d), jnp.float32),
        ],
        interpret=interpret,
    )(x0, w, resid, g)
    return dx0, dw, db


dcn_cross_fused.defvjp(_dcn_cross_fwd, _dcn_cross_bwd)


def dcn_cross_reference(x0: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA reference of the same recurrence (for equivalence tests
    and non-TPU fallbacks)."""
    xl = x0
    for l in range(w.shape[0]):
        s = jnp.sum(xl * w[l][None, :], axis=1, keepdims=True)
        xl = x0 * s + b[l][None, :] + xl
    return xl
