"""Minimal functional NN core: dense / MLP / dropout as init+apply pairs.

Parameters are plain nested dicts of ``jnp.ndarray`` (pytrees), stored
fp32; compute optionally runs in bfloat16 (MXU-native) with fp32
accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


def glorot(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    lim = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -lim, lim)


def init_dense(key, in_dim: int, out_dim: int) -> Params:
    wk, _ = jax.random.split(key)
    return {"w": glorot(wk, (in_dim, out_dim)), "b": jnp.zeros((out_dim,), jnp.float32)}


def dense(p: Params, x: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    w = p["w"].astype(compute_dtype)
    y = jnp.dot(x.astype(compute_dtype), w, preferred_element_type=jnp.float32)
    return y + p["b"]


def init_mlp(key, dims: Sequence[int]) -> Dict[str, Params]:
    """dims = [in, h1, ..., out]."""
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"layer_{i}": init_dense(k, dims[i], dims[i + 1])
        for i, k in enumerate(keys)
    }


def mlp(
    p: Dict[str, Params],
    x: jnp.ndarray,
    activation: Callable = jax.nn.relu,
    final_activation: Optional[Callable] = None,
    dropout_rate: float = 0.0,
    train: bool = False,
    key: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    n = len(p)
    for i in range(n):
        x = dense(p[f"layer_{i}"], x, compute_dtype)
        last = i == n - 1
        act = final_activation if last else activation
        if act is not None:
            x = act(x)
        if dropout_rate > 0.0 and train and not last:
            assert key is not None, "dropout in train mode needs a PRNG key"
            key, sub = jax.random.split(key)
            x = dropout(sub, x, dropout_rate)
    return x


def dropout(key, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def l2_penalty(params, scale: float) -> jnp.ndarray:
    """Sum of squared kernel weights (matches Keras ``l2`` on Dense
    kernels only, ``src/models.py:26-29`` — biases excluded)."""
    leaves = [
        v for path, v in jax.tree_util.tree_leaves_with_path(params)
        if path[-1].key == "w"
    ]
    if not leaves:
        return jnp.float32(0.0)
    return scale * sum(jnp.sum(jnp.square(w)) for w in leaves)
