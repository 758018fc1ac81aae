"""On-device scoring + top-k: the FAISS replacement (SURVEY §2.2).

The reference builds a host-side ``faiss.IndexFlatIP`` over L2-normalized
item embeddings (``src/trainer.py:236-248``) and searches it per request
(``app/recommendation_service.py:72``). Here the "index" is just the
materialized item-embedding matrix living on device (optionally sharded
over the ``model`` axis); search is a jitted normalized matmul +
``lax.top_k``, with a cross-shard merge when sharded.

Normalization contract parity (SURVEY §3.4): ``/recommend`` scores are
cosine (both sides L2-normalized — matching ``faiss.normalize_L2`` +
IndexFlatIP of the reference), while ``score()`` exposes the raw dot
product (the reference's un-normalized ``tf.linalg.matvec`` at
``app/recommendation_service.py:83-92``). Both are explicit options
here rather than an asymmetry by accident.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from recsys_tpu.config import ModelConfig
from recsys_tpu.models.towers import TwoTower
from recsys_tpu.parallel import collectives as coll
from recsys_tpu.parallel.mesh import MeshContext


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


@functools.partial(jax.jit, static_argnames=("cfg", "batch"))
def _item_embs_jit(params, cfg: ModelConfig, ids, batch: int):
    def step(carry, chunk):
        return carry, TwoTower.item_embed(params, chunk, cfg)

    chunks = ids.reshape(-1, batch)
    _, out = jax.lax.scan(step, None, chunks)
    return out.reshape(-1, out.shape[-1])


def materialize_item_embeddings(
    tower_params, cfg: ModelConfig, n_items: int, batch: int = 1024
) -> jnp.ndarray:
    """All item embeddings [n_items, d] via the item tower, padded to a
    full last batch then trimmed (static shapes; the reference loops
    512-row Python batches host-side, ``src/trainer.py:221-226``)."""
    padded = -(-n_items // batch) * batch
    ids = jnp.arange(padded, dtype=jnp.int32).clip(0, n_items - 1)
    return _item_embs_jit(tower_params, cfg, ids, batch)[:n_items]


@functools.partial(jax.jit, static_argnames=("k", "normalize"))
def topk_scores(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    k: int,
    normalize: bool = True,
    item_bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense scoring + top-k on one device. [Q,d]x[N,d] -> ([Q,k], [Q,k]).

    ``normalize=True`` is the reference's cosine contract; with
    ``normalize=False`` + ``item_bias`` the score is the logQ-trained
    estimate of log P(item|user) (EvalConfig.score_norm="dot")."""
    if normalize:
        user_emb = l2_normalize(user_emb)
        item_emb = l2_normalize(item_emb)
    scores = jnp.dot(user_emb, item_emb.T, preferred_element_type=jnp.float32)
    if item_bias is not None:
        scores = scores + item_bias[None, :]
    return jax.lax.top_k(scores, k)


# above this many bytes of dense [Q, N] scores, exact search switches
# to the flash Pallas running-top-k (never materializes the matrix;
# 1.6-2.0x over the blockwise-exact scan at 1M-8M items on v5e —
# kernels_tpu.json "topk" rows, the VERDICT r3 item-2 verdict)
_DENSE_SCORES_CAP = 1 << 30


from recsys_tpu.utils.platform import on_tpu as _on_tpu  # noqa: E402


def exact_topk(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    k: int,
    normalize: bool = True,
    item_bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Size-dispatched EXACT top-k: the dense matmul + ``lax.top_k``
    while the [Q, N] score matrix is small; past ``_DENSE_SCORES_CAP``
    the NON-materializing exact paths — the flash running-top-k kernel
    (:func:`recsys_tpu.ops.pallas.topk_flash.flash_topk`, f32,
    selection identical to dense) on TPU for k <= 128, else the
    blockwise exact scan (any k, any platform; this covers the
    evaluator's over-retrieve branch where k = topk + max_seen can
    reach thousands). Dense scores are never materialized above the
    cap on any branch."""
    q_n = int(user_emb.shape[0])
    n = int(item_emb.shape[0])
    if q_n * n * 4 > _DENSE_SCORES_CAP:
        if _on_tpu() and k <= 128:
            from recsys_tpu.ops.pallas.topk_flash import flash_topk

            return flash_topk(user_emb, item_emb, k, normalize=normalize,
                              bf16=False, item_bias=item_bias)
        from recsys_tpu.ops.topk import blockwise_topk

        if item_bias is not None:
            # fold the bias into the dot via the [u|1].[v|b]
            # augmentation (raw-dot mode only — same trick as
            # flash_topk's item_bias support)
            if normalize:
                raise ValueError("item_bias requires normalize=False")
            user_emb = jnp.concatenate(
                [user_emb, jnp.ones((q_n, 1), user_emb.dtype)], axis=1)
            item_emb = jnp.concatenate(
                [item_emb, item_bias.astype(item_emb.dtype)[:, None]],
                axis=1)
        return blockwise_topk(user_emb, item_emb, k=k, block_size=262144,
                              normalize=normalize)
    return topk_scores(user_emb, item_emb, k, normalize, item_bias)


# Jitted single-dispatch wrappers for the serving hot path. The eager
# alternatives re-ran every primitive as its own dispatch per query —
# and, with normalize=True, re-normalized the full [N, d] catalog per
# call (~1.3 s/query + ~50 MB RSS growth at 1M items, measured by
# serve_large_bench before round 5's fix). Catalog preparation happens
# once (RetrievalIndex._catalog_ready); these run per query.
_l2_jit = jax.jit(l2_normalize)
_exact_topk_jit = jax.jit(exact_topk, static_argnames=("k", "normalize"))
_JIT_CACHE: dict = {}


def _blockwise_jit(*args, **kw):
    if "blockwise" not in _JIT_CACHE:
        from recsys_tpu.ops.topk import blockwise_topk

        _JIT_CACHE["blockwise"] = jax.jit(
            blockwise_topk,
            static_argnames=("k", "block_size", "normalize", "approx"),
        )
    return _JIT_CACHE["blockwise"](*args, **kw)


def _blockwise_int8_jit(*args, **kw):
    if "blockwise_int8" not in _JIT_CACHE:
        from recsys_tpu.ops.topk import blockwise_topk_int8

        _JIT_CACHE["blockwise_int8"] = jax.jit(
            blockwise_topk_int8,
            static_argnames=("k", "block_size", "approx"),
        )
    return _JIT_CACHE["blockwise_int8"](*args, **kw)


def make_sharded_topk(ctx: MeshContext, k: int, normalize: bool = True,
                      masked: bool = False, int8: bool = False):
    """Sharded scorer: items row-sharded over ``model``, queries
    replicated along it (sharded over ``data``); per-shard top-k then
    cross-shard merge (``collectives.merge_topk``).

    ``masked=True`` takes an extra ``[n_items]`` bool argument (sharded
    like the items) and excludes ``False`` rows — how catalog padding to
    a shard multiple stays invisible to search results.

    ``int8=True`` (requires ``masked``) scores int8-quantized shards:
    arguments become ``(user_emb, q_shard int8, scale_shard, mask)``.
    Quantize the L2-normalized rows when cosine is wanted; queries are
    quantized on the fly per shard-call. Combines both catalog-scaling
    axes — n_model shards × 4× rows per chip."""

    def _merge_local(scores, mask_shard, rows):
        scores = jnp.where(mask_shard[None, :], scores, -jnp.inf)
        kk = min(k, rows)
        s, i = jax.lax.top_k(scores, kk)
        gids = i + coll.axis_index(ctx.model_axis) * rows
        return coll.merge_topk(s, gids, k, axis=ctx.model_axis)

    def score_topk(user_emb, item_shard, mask_shard):
        if normalize:
            u = l2_normalize(user_emb)
            v = l2_normalize(item_shard)
        else:
            u, v = user_emb, item_shard
        scores = jnp.dot(u, v.T, preferred_element_type=jnp.float32)
        if mask_shard is None:
            kk = min(k, item_shard.shape[0])
            s, i = jax.lax.top_k(scores, kk)
            gids = i + coll.axis_index(ctx.model_axis) * item_shard.shape[0]
            return coll.merge_topk(s, gids, k, axis=ctx.model_axis)
        return _merge_local(scores, mask_shard, item_shard.shape[0])

    def score_topk_int8(user_emb, q_shard, scale_shard, mask_shard):
        from recsys_tpu.ops.topk import quantize_rows

        u = l2_normalize(user_emb) if normalize else user_emb
        uq, us = quantize_rows(u)
        acc = jax.lax.dot_general(
            uq, q_shard, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = acc.astype(jnp.float32) * (us[:, None] * scale_shard[None, :])
        return _merge_local(scores, mask_shard, q_shard.shape[0])

    item_spec = P(ctx.model_axis, None)
    if int8:
        if not masked:
            raise ValueError("int8 sharded top-k requires masked=True")
        body = score_topk_int8
        in_specs = (P(ctx.data_axis, None), item_spec, P(ctx.model_axis),
                    P(ctx.model_axis))
    elif masked:
        body = score_topk
        in_specs = (P(ctx.data_axis, None), item_spec, P(ctx.model_axis))
    else:
        def body(user_emb, item_shard):
            return score_topk(user_emb, item_shard, None)

        in_specs = (P(ctx.data_axis, None), item_spec)

    return jax.jit(
        jax.shard_map(
            body,
            mesh=ctx.mesh,
            in_specs=in_specs,
            out_specs=(P(ctx.data_axis, None), P(ctx.data_axis, None)),
            check_vma=False,
        )
    )


class RetrievalIndex:
    """Materialized item-embedding "index" + id map. Replaces
    ``faiss.idx`` + ``item_map.json`` (``src/trainer.py:243-245``) with
    one npz artifact; at serve time it lives on device."""

    def __init__(
        self,
        item_embeddings: np.ndarray,
        item_raw_ids: np.ndarray,
        normalize: bool = True,
    ):
        # host copy is canonical; device placement is lazy so that
        # host-only serving never initializes an accelerator backend
        self.item_embeddings_np = np.asarray(item_embeddings, np.float32)
        self.item_raw_ids = np.asarray(item_raw_ids)
        self.normalize = normalize
        self._device_embs = None
        self._device_embs_norm = None  # lazy cosine-normalized catalog
        self._int8 = None  # lazy (q [N,d] int8, scale [N]) on device

    @property
    def item_embeddings(self) -> jnp.ndarray:
        if self._device_embs is None:
            self._device_embs = jnp.asarray(self.item_embeddings_np)
        return self._device_embs

    def _catalog_ready(self) -> jnp.ndarray:
        """Device catalog with the cosine normalization pre-applied
        ONCE (the per-query paths then run with normalize=False on a
        separately normalized query — same math, none of the per-call
        full-catalog churn that serve_large_bench caught)."""
        if not self.normalize:
            return self.item_embeddings
        if self._device_embs_norm is None:
            self._device_embs_norm = _l2_jit(self.item_embeddings)
        return self._device_embs_norm

    def _query_ready(self, user_emb) -> jnp.ndarray:
        u = jnp.asarray(user_emb)
        return _l2_jit(u) if self.normalize else u

    @classmethod
    def build(
        cls,
        tower_params,
        cfg: ModelConfig,
        n_items: int,
        item_raw_ids: np.ndarray,
        normalize: bool = True,
    ) -> "RetrievalIndex":
        embs = materialize_item_embeddings(tower_params, cfg, n_items)
        return cls(np.asarray(embs), item_raw_ids, normalize)

    def search(
        self,
        user_emb: jnp.ndarray,
        k: int,
        approx: bool = False,
        block_size: int = 0,
        int8: bool = False,
        refine_factor: int = 1,
        flash: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (scores [Q,k], dense item ids [Q,k]).

        ``approx=True`` (or an explicit ``block_size``) streams the
        catalog in blocks via :func:`recsys_tpu.ops.topk.blockwise_topk`
        — with ``approx`` the per-block top-k uses the TPU's hardware
        ``approx_max_k`` in bf16 (12× at 8M items, recall@10 0.999); the
        FAISS-replacement answer for multi-million-item catalogs.

        ``flash=True`` runs the Pallas running-top-k kernel
        (:func:`recsys_tpu.ops.pallas.topk_flash.flash_topk`): EXACT
        top-k without materializing [Q, N], for the
        largest-catalog-one-pass regime (k <= 128).

        ``int8=True`` scores against a per-row symmetrically quantized
        catalog (4× less HBM — 4× more items per chip — on the MXU's
        int8 path; quantized after normalization when cosine); ``approx``
        keeps its usual meaning (per-block ``approx_max_k`` vs exact).
        ``refine_factor > 1`` then re-scores the top ``k*refine_factor``
        int8 candidates exactly in f32 (host-side gather of k' rows per
        query — the classic quantized-scan + exact-rerank ANN shape)."""
        if int8:
            from recsys_tpu.ops.topk import blockwise_topk_int8, quantize_rows

            if self._int8 is None:
                self._int8 = jax.jit(quantize_rows)(self._catalog_ready())
            u = self._query_ready(user_emb)
            # cap the candidate count at the catalog: past n_items the
            # scan pads with clipped ids whose placeholder scores the
            # refine pass would overwrite with REAL scores, surfacing
            # duplicate items
            n = self.item_embeddings_np.shape[0]
            k1 = max(k, min(k * max(int(refine_factor), 1), n))
            s, i = _blockwise_int8_jit(
                u, self._int8[0], self._int8[1], k=k1,
                block_size=block_size or 65536, approx=approx,
            )
            if refine_factor <= 1:
                return np.asarray(s), np.asarray(i)
            idx = np.asarray(i)
            cand = self.item_embeddings_np[idx]  # [Q, k', d]
            u_np = np.asarray(u, np.float32)
            if self.normalize:
                cand = cand / np.maximum(
                    np.linalg.norm(cand, axis=-1, keepdims=True), 1e-12
                )
            exact = np.einsum("qd,qcd->qc", u_np, cand)
            order = np.argsort(-exact, axis=1)[:, :k]
            return (
                np.take_along_axis(exact, order, axis=1),
                np.take_along_axis(idx, order, axis=1),
            )
        if flash:
            from recsys_tpu.ops.pallas.topk_flash import flash_topk

            s, i = flash_topk(
                self._query_ready(user_emb), self._catalog_ready(), k,
                normalize=False,
            )
            return np.asarray(s), np.asarray(i)
        if approx or block_size:
            s, i = _blockwise_jit(
                self._query_ready(user_emb),
                self._catalog_ready(),
                k=k,
                block_size=block_size or 65536,
                normalize=False,
                approx=approx,
            )
        else:
            # size-dispatched exact path: flash kernel once the dense
            # [Q, N] scores would not fit (see exact_topk)
            s, i = _exact_topk_jit(self._query_ready(user_emb),
                                   self._catalog_ready(), k=k,
                                   normalize=False)
        return np.asarray(s), np.asarray(i)

    def raw_dot_scores(self, user_emb: jnp.ndarray, item_ids: np.ndarray) -> np.ndarray:
        """Un-normalized dot for the /score contract
        (``app/recommendation_service.py:83-92``)."""
        sel = jnp.take(self.item_embeddings, jnp.asarray(item_ids), axis=0)
        return np.asarray(jnp.einsum("qd,nd->qn", user_emb, sel))

    def shard(self, ctx: MeshContext, int8: bool = False) -> "ShardedIndex":
        """Place this catalog row-sharded over ``ctx``'s model axis
        (optionally int8-quantized: 4× rows per chip)."""
        return ShardedIndex(self, ctx, int8=int8)

    # ---- artifact io ----------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(
            path,
            item_embeddings=self.item_embeddings_np,
            item_raw_ids=self.item_raw_ids,
            normalize=np.array(self.normalize),
        )

    @classmethod
    def load(cls, path: str) -> "RetrievalIndex":
        with np.load(path) as z:
            return cls(
                z["item_embeddings"], z["item_raw_ids"], bool(z["normalize"])
            )


class ShardedIndex:
    """A :class:`RetrievalIndex` whose catalog is row-sharded over the
    ``model`` axis of a device mesh — the multi-chip FAISS replacement:
    each device holds ``n_items / n_model`` rows, search is a per-shard
    normalized matmul + ``lax.top_k`` and a cross-shard candidate merge
    (k·n_model values over ICI, tiny vs the catalog). Catalogs larger
    than one chip's HBM serve from however many chips it takes without
    any host-side index file.

    Rows are zero-padded to a shard multiple; a sharded validity mask
    keeps pad rows out of every result. Queries are padded to a
    ``data``-axis multiple and trimmed on return.

    ``int8=True`` stores the shards int8-quantized (per-row symmetric,
    quantized after normalization when cosine): both catalog-scaling
    axes compose — ``n_model`` shards × 4× rows per chip.
    """

    def __init__(self, index: RetrievalIndex, ctx: MeshContext,
                 int8: bool = False):
        self.ctx = ctx
        self.item_raw_ids = index.item_raw_ids
        self.normalize = index.normalize
        self.int8 = int8
        embs = index.item_embeddings_np
        n, d = embs.shape
        self.n_items = n
        n_pad = -(-n // ctx.n_model) * ctx.n_model
        host = np.zeros((n_pad, d), np.float32)
        host[:n] = embs
        mask = np.zeros((n_pad,), bool)
        mask[:n] = True
        if int8:
            if self.normalize:
                host[:n] = host[:n] / np.maximum(
                    np.linalg.norm(host[:n], axis=-1, keepdims=True), 1e-12
                )
            absmax = np.maximum(np.max(np.abs(host), axis=-1), 1e-12)
            scale = (absmax / 127.0).astype(np.float32)
            q = np.clip(
                np.round(host / scale[:, None]), -127, 127
            ).astype(np.int8)
            self.item_q = jax.device_put(
                q, ctx.sharding(ctx.model_axis, None)
            )
            self.item_scale = jax.device_put(
                scale, ctx.sharding(ctx.model_axis)
            )
            self.item_embeddings = None
        else:
            self.item_embeddings = jax.device_put(
                host, ctx.sharding(ctx.model_axis, None)
            )
        self.item_mask = jax.device_put(mask, ctx.sharding(ctx.model_axis))
        self._fns: Dict[int, object] = {}

    def search(self, user_emb, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """-> (scores [Q,k], dense item ids [Q,k]), global ids < n_items."""
        u = np.asarray(user_emb, np.float32)
        q = u.shape[0]
        q_pad = -(-q // self.ctx.n_data) * self.ctx.n_data
        if q_pad != q:
            u = np.concatenate(
                [u, np.zeros((q_pad - q, u.shape[1]), np.float32)]
            )
        fn = self._fns.get(k)
        if fn is None:
            fn = self._fns[k] = make_sharded_topk(
                self.ctx, k, self.normalize, masked=True, int8=self.int8
            )
        ud = jax.device_put(u, self.ctx.sharding(self.ctx.data_axis, None))
        if self.int8:
            s, i = fn(ud, self.item_q, self.item_scale, self.item_mask)
        else:
            s, i = fn(ud, self.item_embeddings, self.item_mask)
        return np.asarray(s)[:q], np.asarray(i)[:q]
