"""Flash exact top-k retrieval (Pallas TPU kernel).

The evaluator/serving hot path is "score Q queries against an N-item
catalog, keep each query's top-k" (the FAISS ``IndexFlatIP.search``
being replaced, ``/root/reference/app/recommendation_service.py:72``,
``src/trainer.py:204-213``). The XLA blockwise path
(:func:`recsys_tpu.ops.topk.blockwise_topk`) is exact but pays a full
``lax.top_k`` **sort** per block — measured 36x off the chip's matmul
roofline at N=8M (scale.json: 1,600 ms for 4,096 queries, vs 60 ms for
the approximate ``lax.approx_max_k`` path).

This kernel closes that gap while staying exact, flash-attention
style: the grid sweeps (query_tile outer, item_block inner — the same
accumulate-along-the-inner-axis layout as flash_ce; item blocks are
re-streamed per query tile, which large TQ amortizes), each step is
one MXU matmul ``[TQ, d] x [d, TB]``, and a per-query running top-k
candidate buffer lives in VMEM scratch across the inner sweep — the
[Q, N] score matrix never exists. Two tricks make the selection cost
vanish:

1. **Threshold gating** — per block, one VPU pass computes each row's
   block max; if no row beats its current buffer minimum, the entire
   extraction is skipped (``@pl.when`` on one scalar). For i.i.d.
   catalog order the expected number of extracting blocks decays
   harmonically, so steady state is matmul + one pass.
2. **One vector domain** — every per-query vector in the kernel is
   query-on-sublane: block scores are [TQ, TB], the candidate buffer
   is [TQ, 128] (candidate slots on lanes), so buffer mins and
   replace-min insertion are lane reductions and the kernel needs no
   1-D cross-layout relayouts (an earlier query-on-lane buffer draft
   compiled to wrong results on real Mosaic; interpret mode hid it).

Extraction, when triggered, is ``k`` iterations of
(row-max, lowest-index argmax via a min-where pass, mask, insert by
replacing the buffer's per-row minimum). Eviction of a buffer minimum
in favor of a larger candidate can only discard an element dominated
by >= 128 >= k others, so the buffer always contains the true top-k of
everything seen — exactness does not depend on the gate.

Scoring runs on the MXU in bf16 with fp32 accumulation by default
(``bf16=False`` for bit-exact-vs-f32-XLA selection); the final
[Q, 128] -> [Q, k] sort happens outside the kernel in plain XLA. Ties
at the k-boundary may resolve to different (equal-scoring) ids than
``lax.top_k``'s global lowest-index rule; within a block the
lowest-index rule is preserved.

**Round-4 verdict (measured on the chip — kernels_tpu.json "topk",
4,096 queries, dim 128, k=10): this is the production exact path.**
f32 flash: 208 ms at 1M items / 759 ms at 8M — 1.3x / 2.0x over the
blockwise-exact scan, and at 8M the dense [Q, N] path cannot run at
all. Wired as :func:`recsys_tpu.retrieval.scorer.exact_topk` (dense
under 1 GiB of scores, flash above), which the evaluator and
``RetrievalIndex.search``'s exact branch dispatch through. The bf16
group-max sieve below is 2.1x faster again at 8M (353 ms) but is not
strictly exact (measured recall 0.9998-0.9999) — kept as the
recall-tolerant middle ground between exact flash and
``approx_max_k`` (150 ms, recall 0.9996).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
KBUF = 128  # candidate slots per query (lane width); implies k <= 128


from recsys_tpu.utils.platform import on_tpu as _on_tpu  # noqa: E402


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(u_ref, v_ref, os_ref, oi_ref, bs_scr, bi_scr, *,
            n_items: int, k: int, tq: int, tb: int, gate: bool):
    b = pl.program_id(1)  # item blocks sweep innermost (sequential)
    n_b = pl.num_programs(1)

    @pl.when(b == 0)
    def _():
        bs_scr[:] = jnp.full((tq, KBUF), NEG_INF, jnp.float32)
        bi_scr[:] = jnp.zeros((tq, KBUF), jnp.int32)

    s = jax.lax.dot_general(
        u_ref[:], v_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tq, tb]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, tb), 1)
    if n_items % tb != 0:  # mask the padded catalog tail (static check)
        s = jnp.where(b * tb + col_iota < n_items, s, NEG_INF)

    buf_s = bs_scr[:]  # [tq, KBUF] candidate slots on lanes
    buf_i = bi_scr[:]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, KBUF), 1)
    n_extract = min(k, tb)

    def cond(carry):
        it, s_c, m, bs, bi = carry
        # stop as soon as NO row's remaining block max beats its buffer
        # minimum — the expected iteration count decays harmonically
        # with the block index, so late blocks cost ~1 max-pass total
        return (it < n_extract) & jnp.any(m > jnp.min(bs, axis=1))

    def body(carry):
        it, s_c, m, bs, bi = carry
        # lowest-index argmax via min-where (deterministic tie-break)
        a = jnp.min(jnp.where(s_c == m[:, None], col_iota, tb), axis=1)
        s_c = jnp.where(col_iota == a[:, None], NEG_INF, s_c)
        gid = (b * tb + a).astype(jnp.int32)  # [tq]
        bmin = jnp.min(bs, axis=1)  # [tq]
        bcol = jnp.min(
            jnp.where(bs == bmin[:, None], slot_iota, KBUF), axis=1
        )
        upd = (slot_iota == bcol[:, None]) & (m > bmin)[:, None]
        bs = jnp.where(upd, m[:, None], bs)
        bi = jnp.where(upd, gid[:, None], bi)
        return it + 1, s_c, jnp.max(s_c, axis=1), bs, bi

    m0 = jnp.max(s, axis=1)  # [tq]

    def extract():
        _, _, _, bs, bi = jax.lax.while_loop(
            cond, body, (0, s, m0, buf_s, buf_i)
        )
        bs_scr[:] = bs
        bi_scr[:] = bi

    if gate:
        # one VPU pass: can this block beat any row's buffer minimum?
        any_better = jnp.any(m0 > jnp.min(buf_s, axis=1))

        @pl.when(any_better)
        def _():
            extract()
    else:
        extract()

    @pl.when(b == n_b - 1)
    def _():
        os_ref[:] = bs_scr[:]
        oi_ref[:] = bi_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_items", "q_tile", "normalize", "bf16", "gate",
        "interpret",
    ),
)
def flash_topk(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    k: int,
    block_items: int = 1024,
    q_tile: int = 512,
    normalize: bool = True,
    bf16: bool = True,
    gate: bool = True,
    interpret: Optional[bool] = None,
    item_bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k of ``user_emb @ item_emb.T``: [Q,d] x [N,d] ->
    ([Q,k] scores, [Q,k] int32 ids) without materializing [Q,N].

    Same contract as :func:`recsys_tpu.ops.topk.blockwise_topk`;
    ``bf16=True`` rounds the embeddings to bfloat16 before the MXU
    matmul (fp32 accumulation) — selection is then exact w.r.t. the
    bf16-rounded scores (pass ``bf16=False`` for bit-exact parity
    with the f32 XLA path). Requires ``k <= 128``.

    ``item_bias`` ([N], raw-dot scoring only) is folded into the dot
    itself by augmenting the embeddings one coordinate — queries get a
    constant 1, items get their bias — so the kernel needs no extra
    operand: score = [u|1] . [v|b] = u.v + b.
    """
    if k > KBUF:
        raise ValueError(f"flash_topk supports k <= {KBUF}, got {k}")
    if interpret is None:
        interpret = not _on_tpu()
    if item_bias is not None:
        if normalize:
            raise ValueError("item_bias requires normalize=False "
                             "(raw-dot scoring)")
        user_emb = jnp.concatenate(
            [user_emb, jnp.ones((user_emb.shape[0], 1), user_emb.dtype)],
            axis=1)
        item_emb = jnp.concatenate(
            [item_emb, item_bias.astype(item_emb.dtype)[:, None]], axis=1)
    q_n, d = user_emb.shape
    n = item_emb.shape[0]
    if normalize:
        user_emb = user_emb / jnp.maximum(
            jnp.linalg.norm(user_emb, axis=-1, keepdims=True), 1e-12
        )
        item_emb = item_emb / jnp.maximum(
            jnp.linalg.norm(item_emb, axis=-1, keepdims=True), 1e-12
        )
    dt = jnp.bfloat16 if bf16 else jnp.float32
    user_emb = user_emb.astype(dt)
    item_emb = item_emb.astype(dt)

    tq = min(q_tile, _round_up(q_n, 16))
    tb = min(block_items, _round_up(n, 128))
    qp = _round_up(q_n, tq)
    np_ = _round_up(n, tb)
    dp = _round_up(d, 128)
    user_emb = jnp.pad(user_emb, ((0, qp - q_n), (0, dp - d)))
    item_emb = jnp.pad(item_emb, ((0, np_ - n), (0, dp - d)))
    n_q, n_b = qp // tq, np_ // tb

    kern = functools.partial(
        _kernel, n_items=n, k=min(k, n), tq=tq, tb=tb, gate=gate,
    )
    out_s, out_i = pl.pallas_call(
        kern,
        grid=(n_q, n_b),
        in_specs=[
            pl.BlockSpec((tq, dp), lambda q, b: (q, 0)),
            pl.BlockSpec((tb, dp), lambda q, b: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tq, KBUF), lambda q, b: (q, 0)),
            pl.BlockSpec((tq, KBUF), lambda q, b: (q, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, KBUF), jnp.float32),
            jax.ShapeDtypeStruct((qp, KBUF), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, KBUF), jnp.float32),
            pltpu.VMEM((tq, KBUF), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            # the catalog is re-streamed once per query tile
            flops=2 * qp * np_ * dp,
            bytes_accessed=(
                n_q * np_ * dp * item_emb.dtype.itemsize
                + qp * dp * user_emb.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(user_emb, item_emb)

    cand_s = out_s[:q_n]
    cand_i = out_i[:q_n]
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=-1)
    return top_s, top_i


# ---- two-pass exact top-k: group-max sieve + rescore ----------------------
#
# Pass 1 (Pallas, matmul-bound): score each [TQ, TB] tile on the MXU and
# keep only each query's MAX per G-item group — no selection logic in
# the hot loop at all. Pass 2 (plain XLA): the top-k groups per row by
# group max provably contain every top-k element (if a top-k element's
# group max were below the k-th largest group max, k distinct elements
# — those group maxima — would each beat it, contradiction), so gather
# those k groups' items, rescore, and take the final top-k. Ties at the
# k-th-group boundary resolve arbitrarily (same caveat as lax.top_k
# with duplicate scores).


def _blockmax_kernel(u_ref, v_ref, m_ref, *, n_items: int, tq: int,
                     tb: int, n_g: int, g: int):
    b = pl.program_id(1)
    # items-on-sublanes: the group split then reshapes the SUBLANE dim
    # (lane-dim reshapes don't lower on Mosaic), and the (n_g, tq)
    # result is already in the transposed output layout
    st = jax.lax.dot_general(
        v_ref[:], u_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tb, tq]
    if n_items % tb != 0:
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, tq), 0)
        st = jnp.where(b * tb + row_iota < n_items, st, NEG_INF)
    m_ref[:] = jnp.max(st.reshape(n_g, g, tq), axis=1)


def _iter_topk(scores: jnp.ndarray, k: int):
    """[Q, C] -> top-k per row via k masked-argmax passes (cheaper than
    lax.top_k's full sort when C >> k); lowest-index tie-break."""
    q_n, c = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (q_n, c), 1)
    s = scores
    outs, outi = [], []
    for _ in range(k):
        m = jnp.max(s, axis=1)
        a = jnp.min(jnp.where(s == m[:, None], col, c), axis=1)
        outs.append(m)
        outi.append(a.astype(jnp.int32))
        s = jnp.where(col == a[:, None], NEG_INF, s)
    return jnp.stack(outs, axis=1), jnp.stack(outi, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "group", "block_items", "q_tile", "normalize", "bf16",
        "interpret",
    ),
)
def blockmax_topk(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    k: int,
    group: int = 512,
    block_items: int = 4096,
    q_tile: int = 256,
    normalize: bool = True,
    bf16: bool = True,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k via the group-max sieve: [Q,d] x [N,d] ->
    ([Q,k], [Q,k] int32 ids). Same contract as :func:`flash_topk`;
    pass 1 runs at matmul speed, the rescore touches only
    ``k * group`` candidates per query.

    Measured verdict (kernels_tpu.json "topk"): fastest
    NEAR-exact path at 8M items (353 ms bf16 vs flash's 759) but NOT
    strictly exact in practice — recall@10 0.9998-0.9999 vs the f32
    reference (boundary groups reorder under pass-1-kernel vs rescore
    rounding), and the f32 variant OOMs at 8M (the [Q, n_groups]
    group-max matrix). Production exact search therefore uses
    :func:`flash_topk` (via ``scorer.exact_topk``); this kernel is the
    recall-tolerant middle ground between it and ``approx_max_k``."""
    if interpret is None:
        interpret = not _on_tpu()
    q_n, d = user_emb.shape
    n = item_emb.shape[0]
    if normalize:
        user_emb = user_emb / jnp.maximum(
            jnp.linalg.norm(user_emb, axis=-1, keepdims=True), 1e-12
        )
        item_emb = item_emb / jnp.maximum(
            jnp.linalg.norm(item_emb, axis=-1, keepdims=True), 1e-12
        )
    dt = jnp.bfloat16 if bf16 else jnp.float32
    user_emb = user_emb.astype(dt)
    item_emb = item_emb.astype(dt)

    g = min(group, _round_up(n, 128))
    tb = max(min(block_items, _round_up(n, 128)), g)
    # Mosaic block constraint: the (n_g, tq) output block needs n_g % 8
    # == 0 and tq % 128 == 0 (or == the full dimension)
    tb = _round_up(tb, 8 * g)
    n_g = tb // g
    qp0 = _round_up(q_n, 16)
    tq = qp0 if qp0 <= q_tile else _round_up(q_tile, 128)
    qp = _round_up(q_n, tq)
    np_ = _round_up(n, tb)
    dp = _round_up(d, 128)
    u_pad = jnp.pad(user_emb, ((0, qp - q_n), (0, dp - d)))
    v_pad = jnp.pad(item_emb, ((0, np_ - n), (0, dp - d)))
    n_q, n_b = qp // tq, np_ // tb
    n_groups = n_b * n_g

    kern = functools.partial(
        _blockmax_kernel, n_items=n, tq=tq, tb=tb, n_g=n_g, g=g,
    )
    m_mat = pl.pallas_call(
        kern,
        grid=(n_q, n_b),
        in_specs=[
            pl.BlockSpec((tq, dp), lambda q, b: (q, 0)),
            pl.BlockSpec((tb, dp), lambda q, b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((n_g, tq), lambda q, b: (b, q)),
        out_shape=jax.ShapeDtypeStruct((n_groups, qp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * np_ * dp,
            bytes_accessed=(
                n_q * np_ * dp * v_pad.dtype.itemsize
                + qp * dp * u_pad.dtype.itemsize
                + qp * n_groups * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(u_pad, v_pad)  # [n_groups, qp]

    m_mat = m_mat.T[:q_n]
    kg = min(k, n_groups)
    _, top_groups = _iter_topk(m_mat, kg)  # [Q, kg]

    # gather the kg winning groups' items and rescore exactly
    lanes = jax.lax.broadcasted_iota(jnp.int32, (q_n, kg, g), 2)
    idx = top_groups[:, :, None] * g + lanes  # [Q, kg, g] global ids
    valid = idx < n
    idx_c = jnp.minimum(idx, n - 1).reshape(q_n, kg * g)
    cand = jnp.take(v_pad[:n], idx_c, axis=0)  # [Q, kg*g, d]
    scores = jnp.einsum(
        "qd,qcd->qc", u_pad[:q_n], cand,
        preferred_element_type=jnp.float32,
    )
    scores = jnp.where(valid.reshape(q_n, kg * g), scores, NEG_INF)
    kk = min(k, n)
    top_s, pos = _iter_topk(scores, kk)
    top_i = jnp.take_along_axis(idx_c, pos, axis=1)
    if kk < k:  # k > catalog: pad to the blockwise contract
        top_s = jnp.pad(top_s, ((0, 0), (0, k - kk)),
                        constant_values=NEG_INF)
        top_i = jnp.pad(top_i, ((0, 0), (0, k - kk)))
    return top_s, top_i
