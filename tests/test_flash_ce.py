"""Flash sampled-softmax CE kernel: equivalence vs the dense XLA path
(interpret mode on CPU; verified compiled on the real TPU too)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.config import ModelConfig
from recsys_tpu.models import losses
from recsys_tpu.models.multitask import MultiTaskModel
from recsys_tpu.ops.pallas.flash_ce import in_batch_softmax_flash


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    b, d = 64, 32
    return {
        "u": jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)),
        "v": jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)),
        "ids": jnp.asarray(rng.integers(0, 40, b).astype(np.int32)),
        "logq": jnp.asarray(rng.normal(size=b).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=b).astype(np.float32)),
        "mask": jnp.asarray((rng.random(b) > 0.3).astype(np.float32)),
    }


def test_forward_matches_dense(data):
    a = float(in_batch_softmax_flash(
        data["u"], data["v"], data["ids"],
        log_q=data["logq"], item_bias=data["bias"]))
    r = float(losses.in_batch_softmax(
        data["u"], data["v"], item_ids=data["ids"],
        log_q=data["logq"], item_bias=data["bias"]))
    np.testing.assert_allclose(a, r, rtol=1e-6)


def test_forward_masked(data):
    a = float(in_batch_softmax_flash(
        data["u"], data["v"], data["ids"], mask=data["mask"]))
    r = float(losses.in_batch_softmax(
        data["u"], data["v"], item_ids=data["ids"], mask=data["mask"]))
    np.testing.assert_allclose(a, r, rtol=1e-6)


def test_gradients_match_dense(data):
    u, v, ids = data["u"], data["v"], data["ids"]
    logq, bias = data["logq"], data["bias"]
    ga = jax.grad(
        lambda u, v, b: in_batch_softmax_flash(u, v, ids, log_q=logq, item_bias=b),
        argnums=(0, 1, 2),
    )(u, v, bias)
    gr = jax.grad(
        lambda u, v, b: losses.in_batch_softmax(
            u, v, item_ids=ids, log_q=logq, item_bias=b),
        argnums=(0, 1, 2),
    )(u, v, bias)
    for a, r in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-6)


def test_multitask_flag_matches(data):
    cfg = ModelConfig(embedding_dim=16, user_tower_dims=(32,),
                      item_tower_dims=(32,), cross_layers=1, dnn_dims=(16,),
                      dropout_rate=0.0, mixed_precision=False)
    cfg_fl = dataclasses.replace(cfg, use_flash_ce=True)
    params = MultiTaskModel.init(jax.random.PRNGKey(0), cfg, 40, 64)
    rng = np.random.default_rng(1)
    batch = {
        "user_id": jnp.asarray(rng.integers(0, 40, 64).astype(np.int32)),
        "movie_id": jnp.asarray(rng.integers(0, 64, 64).astype(np.int32)),
        "rating": jnp.asarray(rng.uniform(1, 5, 64).astype(np.float32)),
        "y_implicit": jnp.asarray((rng.random(64) > 0.4).astype(np.float32)),
        "log_q": jnp.asarray(rng.normal(size=64).astype(np.float32)),
    }
    l1, _ = MultiTaskModel.loss(params, cfg, batch, train=False)
    l2, _ = MultiTaskModel.loss(params, cfg_fl, batch, train=False)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    g1 = jax.grad(lambda p: MultiTaskModel.loss(p, cfg, batch, train=False)[0])(params)
    g2 = jax.grad(lambda p: MultiTaskModel.loss(p, cfg_fl, batch, train=False)[0])(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
