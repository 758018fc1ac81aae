"""NumPy-tower serving parity: the host single-query path must match
the jax TwoTower forward, and native/device search must agree."""

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.config import ModelConfig
from recsys_tpu.models.towers import TwoTower
from recsys_tpu.serve.service import RecommendationService


def _mk_service(cfg, n_users=30, n_items=50):
    svc = RecommendationService.__new__(RecommendationService)
    svc.backend = "native"
    svc.config = type("C", (), {"model": cfg})()
    params = TwoTower.init(jax.random.PRNGKey(0), cfg, n_users, n_items)
    svc.encoder_params = jax.device_get(params)
    return svc, params


def test_numpy_tower_matches_jax_fp32():
    cfg = ModelConfig(embedding_dim=16, user_tower_dims=(32, 16),
                      mixed_precision=False, dropout_rate=0.0,
                      tower_residual=True)
    svc, params = _mk_service(cfg)
    ids = np.array([0, 3, 7, 29])
    got = svc._user_embedding_np(ids)
    ref = np.asarray(TwoTower.user_embed(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_numpy_tower_close_with_bf16():
    cfg = ModelConfig(embedding_dim=32, user_tower_dims=(64,),
                      mixed_precision=True, dropout_rate=0.0)
    svc, params = _mk_service(cfg)
    ids = np.arange(10)
    got = svc._user_embedding_np(ids)
    ref = np.asarray(TwoTower.user_embed(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)


def test_numpy_tower_no_residual():
    cfg = ModelConfig(embedding_dim=16, user_tower_dims=(32,),
                      mixed_precision=False, dropout_rate=0.0,
                      tower_residual=False)
    svc, params = _mk_service(cfg)
    ids = np.array([1, 2])
    got = svc._user_embedding_np(ids)
    ref = np.asarray(TwoTower.user_embed(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
