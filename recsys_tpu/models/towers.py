"""Two-tower encoder: dense-int embedding lookup + per-tower MLPs.

Capability parity with ``MultiTowerModel`` (``src/models.py:59-102``):

* per tower: id -> embedding row -> MLP(tower_dims, relu) -> linear
  projection back to ``embedding_dim`` (``src/models.py:70-77``),
* **single-tower invocation** — serving/eval call user-only or
  item-only (``src/models.py:79-91``; consumed at
  ``app/recommendation_service.py:69`` and ``src/trainer.py:203,225``)
  — here as separate ``user_embed`` / ``item_embed`` pure functions,
* no string lookup in the forward path: the reference's
  ``StringLookup -> Embedding`` pair collapses to a dense-int
  ``jnp.take`` (the id remap happened once, offline, in preprocessing).

The out-of-vocab row of the reference (lookup index 0 = OOV,
``Embedding(vocab+1, ...)``) maps to reserving row index ``n`` for
unknown ids: lookups clip to ``[0, n]`` where row ``n`` is the OOV row.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from recsys_tpu.config import ModelConfig
from recsys_tpu.models import layers as L


class TwoTower:
    """Namespace of pure functions (init / user_embed / item_embed /
    apply). Params are a nested dict pytree."""

    @staticmethod
    def init(
        key, cfg: ModelConfig, n_users: int, n_items: int, rows_multiple: int = 1
    ) -> Dict:
        """``rows_multiple`` pads table row counts so they divide evenly
        across a row-sharded ``model`` axis; padding rows sit above the
        OOV row and are unreachable (lookups clip to the OOV row)."""
        k_ut, k_it, k_um, k_im = jax.random.split(key, 4)
        d = cfg.embedding_dim

        def rows(n):
            # +1 OOV row, parity with Embedding(vocab_size + 1, dim)
            return -(-(n + 1) // rows_multiple) * rows_multiple

        scale = d ** -0.5
        return {
            "user_table": jax.random.normal(k_ut, (rows(n_users), d)) * scale,
            "item_table": jax.random.normal(k_it, (rows(n_items), d)) * scale,
            "user_tower": L.init_mlp(k_um, [d, *cfg.user_tower_dims, d]),
            "item_tower": L.init_mlp(k_im, [d, *cfg.item_tower_dims, d]),
            # learnable per-item softmax bias. The trainer initializes it
            # to the item's log train frequency so that the logQ-corrected
            # in-batch softmax starts balanced (without this, the model
            # must first spend its capacity learning -log q_j offsets of
            # ~9 nats through near-zero dot products and retrieval never
            # takes off — observed, not hypothetical).
            "item_bias": jnp.zeros((rows(n_items),), jnp.float32),
        }

    @staticmethod
    def _tower(
        table: jnp.ndarray,
        tower_params: Dict,
        ids: jnp.ndarray,
        cfg: ModelConfig,
        train: bool,
        key: Optional[jax.Array],
        lookup=None,
    ) -> jnp.ndarray:
        # ``lookup(table, ids) -> rows`` overrides the default gather —
        # the trainer's SPMD step passes the psum/a2a row-sharded
        # lookup bodies (embed/table.py) here, so the collective
        # exchange runs INSIDE the gradient step and its transpose
        # (scatter-add into local table rows) is derived by autodiff.
        if lookup is not None:
            if ids.ndim > 1:  # e.g. explicit negatives [B, K]
                rows = lookup(table, ids.reshape(-1)).reshape(
                    ids.shape + (table.shape[-1],)
                )
            else:
                rows = lookup(table, ids)
        else:
            n_oov = table.shape[0] - 1
            rows = jnp.take(table, jnp.clip(ids, 0, n_oov), axis=0)
        dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
        out = L.mlp(
            tower_params,
            rows,
            activation=jax.nn.relu,
            final_activation=None,  # linear head (src/models.py:72,76)
            dropout_rate=cfg.dropout_rate,
            train=train,
            key=key,
            compute_dtype=dtype,
        ).astype(jnp.float32)
        if cfg.tower_residual:
            out = out + rows
        return out

    @staticmethod
    def user_embed(params, user_ids, cfg, train=False, key=None,
                   lookup=None) -> jnp.ndarray:
        return TwoTower._tower(
            params["user_table"], params["user_tower"], user_ids, cfg, train,
            key, lookup,
        )

    @staticmethod
    def item_embed(params, item_ids, cfg, train=False, key=None,
                   lookup=None) -> jnp.ndarray:
        return TwoTower._tower(
            params["item_table"], params["item_tower"], item_ids, cfg, train,
            key, lookup,
        )

    @staticmethod
    def apply(
        params,
        cfg: ModelConfig,
        user_ids: Optional[jnp.ndarray] = None,
        item_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
        key: Optional[jax.Array] = None,
        lookup=None,
    ) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """Partial-input contract of ``MultiTowerModel.call``
        (``src/models.py:79-91``): returns (user_emb | None,
        item_emb | None) for whichever ids were given."""
        ku = ki = None
        if key is not None:
            ku, ki = jax.random.split(key)
        u = (
            TwoTower.user_embed(params, user_ids, cfg, train, ku, lookup)
            if user_ids is not None else None
        )
        v = (
            TwoTower.item_embed(params, item_ids, cfg, train, ki, lookup)
            if item_ids is not None else None
        )
        return u, v
