"""Self-contained optimizer core (init/update over pytrees).

Parity with the reference's optimizer wiring (``src/trainer.py:157-163``):
Adagrad over ``ExponentialDecay(lr, decay_steps=1000, rate=0.96,
staircase=True)`` with global-norm clipping 1.0. Plus linear warmup —
the reference's ``warmup_steps`` config field is dead
(``src/config.py:30``); here it works.

The update is a pure function of (grads, state, step), jit/pjit-safe;
slot variables inherit the parameter's sharding, so a row-sharded
embedding table gets row-sharded accumulators for free.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def exponential_decay(
    lr: float,
    decay_steps: int = 1000,
    decay_rate: float = 0.96,
    staircase: bool = True,
    warmup_steps: int = 0,
) -> Schedule:
    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step = step.astype(jnp.float32)
        p = step / decay_steps
        if staircase:
            p = jnp.floor(p)
        base = lr * decay_rate ** p
        if warmup_steps > 0:
            warm = lr * (step + 1.0) / warmup_steps
            base = jnp.where(step < warmup_steps, warm, base)
        return base

    return schedule


def clip_by_global_norm(grads: Any, max_norm: float) -> Any:
    leaves = jax.tree.leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads)


@dataclasses.dataclass(frozen=True)
class Optimizer:
    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any, jnp.ndarray], Tuple[Any, Any]]


def adagrad(
    schedule: Schedule,
    initial_accumulator: float = 0.1,  # Keras Adagrad default
    eps: float = 1e-7,
    clipnorm: float = 0.0,
) -> Optimizer:
    def init(params):
        return {
            "accum": jax.tree.map(
                lambda p: jnp.full_like(p, initial_accumulator), params
            )
        }

    def update(grads, state, params, step):
        if clipnorm > 0:
            grads = clip_by_global_norm(grads, clipnorm)
        lr = schedule(step)
        accum = jax.tree.map(lambda a, g: a + jnp.square(g), state["accum"], grads)
        new_params = jax.tree.map(
            lambda p, g, a: p - lr * g / (jnp.sqrt(a) + eps), params, grads, accum
        )
        return new_params, {"accum": accum}

    return Optimizer(init, update)


def adam(
    schedule: Schedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    clipnorm: float = 0.0,
) -> Optimizer:
    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return {"mu": z, "nu": jax.tree.map(jnp.zeros_like, params)}

    def update(grads, state, params, step):
        if clipnorm > 0:
            grads = clip_by_global_norm(grads, clipnorm)
        lr = schedule(step)
        t = step.astype(jnp.float32) + 1.0
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], grads)
        mhat_scale = 1.0 / (1 - b1 ** t)
        vhat_scale = 1.0 / (1 - b2 ** t)
        new_params = jax.tree.map(
            lambda p, m, v: p - lr * (m * mhat_scale) / (jnp.sqrt(v * vhat_scale) + eps),
            params, mu, nu,
        )
        return new_params, {"mu": mu, "nu": nu}

    return Optimizer(init, update)


def make_optimizer(train_cfg) -> Optimizer:
    """Build the configured optimizer from a TrainConfig."""
    sched = exponential_decay(
        train_cfg.learning_rate,
        train_cfg.lr_decay_steps,
        train_cfg.lr_decay_rate,
        train_cfg.lr_staircase,
        train_cfg.warmup_steps,
    )
    if train_cfg.optimizer == "adagrad":
        return adagrad(sched, clipnorm=train_cfg.clipnorm)
    if train_cfg.optimizer == "adam":
        return adam(sched, clipnorm=train_cfg.clipnorm)
    raise ValueError(f"unknown optimizer {train_cfg.optimizer!r}")
