"""Deep & Cross Network (DCNv1, rank-1 cross vectors).

Parity with ``DeepCrossNetwork`` (``src/models.py:14-55``):

* cross layers: ``x_{l+1} = x0 * (x_l . w_l) + b_l + x_l`` with a
  per-layer *vector* ``w_l`` of shape (d,) — the rank-1 cross of
  ``src/models.py:40-44``,
* parallel deep MLP (relu) over ``dnn_dims`` (``:46-48``),
* output = concat(cross_out, deep_out) (``:50``),
* L2 regularization applies to deep Dense kernels (``:26-29``) via
  ``layers.l2_penalty`` at the loss level,
* ``dropout_rate`` is **actually applied** here (in the deep branch,
  train mode) — the reference stores it but never uses it
  (``src/models.py:18-29``; documented fix, SURVEY §7.1.3).

The fused Pallas kernel variant lives in
``recsys_tpu.ops.pallas.dcn_cross``; this is the XLA reference path the
kernel is equivalence-tested against.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from recsys_tpu.config import ModelConfig
from recsys_tpu.models import layers as L


class DeepCrossNetwork:
    @staticmethod
    def init(key, cfg: ModelConfig, input_dim: int) -> Dict:
        kc, kd = jax.random.split(key)
        cross_keys = jax.random.split(kc, cfg.cross_layers)
        return {
            "cross": {
                f"layer_{i}": {
                    "w": L.glorot(k, (input_dim, 1))[:, 0],
                    "b": jnp.zeros((input_dim,), jnp.float32),
                }
                for i, k in enumerate(cross_keys)
            },
            "deep": L.init_mlp(kd, [input_dim, *cfg.dnn_dims]),
        }

    @staticmethod
    def output_dim(cfg: ModelConfig, input_dim: int) -> int:
        return input_dim + (cfg.dnn_dims[-1] if cfg.dnn_dims else 0)

    @staticmethod
    def apply(
        params: Dict,
        x: jnp.ndarray,
        cfg: ModelConfig,
        train: bool = False,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
        x0 = x.astype(dtype)
        if cfg.use_pallas_dcn and cfg.cross_layers > 0:
            from recsys_tpu.ops.pallas.dcn_cross import dcn_cross_fused

            w_stack = jnp.stack(
                [params["cross"][f"layer_{i}"]["w"] for i in range(cfg.cross_layers)]
            )
            b_stack = jnp.stack(
                [params["cross"][f"layer_{i}"]["b"] for i in range(cfg.cross_layers)]
            )
            xl = dcn_cross_fused(
                x0.astype(jnp.float32), w_stack, b_stack
            ).astype(dtype)
        else:
            xl = x0
            for i in range(cfg.cross_layers):
                p = params["cross"][f"layer_{i}"]
                w = p["w"].astype(dtype)
                # (x_l . w) is [B, 1]; fp32 accumulate on the reduction
                xw = jnp.sum(xl * w, axis=-1, keepdims=True, dtype=jnp.float32)
                xl = (x0 * xw.astype(dtype) + p["b"].astype(dtype) + xl).astype(dtype)
        if not params["deep"]:
            return xl.astype(jnp.float32)
        deep = L.mlp(
            params["deep"],
            x0,
            activation=jax.nn.relu,
            final_activation=jax.nn.relu,  # every deep layer is relu (src/models.py:31-34)
            dropout_rate=cfg.dropout_rate,
            train=train,
            key=key,
            compute_dtype=dtype,
        )
        return jnp.concatenate([xl, deep], axis=-1).astype(jnp.float32)
