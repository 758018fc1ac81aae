"""The retrieval-loss "auto" policy (VERDICT r3 item 3): the regime
map measured in benchmarks/results/kernels_tpu.json — dense XLA while
the logits fit, the non-materializing path above the cap — must be
encoded in config, not left to the user.
"""

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.config import ModelConfig
from recsys_tpu.models import losses
from recsys_tpu.models.multitask import MultiTaskModel


# ---- resolver unit behavior ---------------------------------------------

def test_auto_small_batch_picks_xla():
    assert losses.resolve_retrieval_loss("auto", 4096, 4096, "tpu") == "xla"
    assert losses.resolve_retrieval_loss("auto", 4096, 4096, "cpu") == "xla"


def test_auto_tpu_picks_flash_from_full_step_crossover():
    """On TPU the FULL-train-step measurement (kernels_tpu.json
    train_step_flash) puts flash ahead from 8k candidates; 'auto'
    follows the full step, not the kernel microbench."""
    assert losses.resolve_retrieval_loss("auto", 8192, 8192, "tpu") == "flash"
    assert losses.resolve_retrieval_loss(
        "auto", 4096, 32768, "tpu") == "flash"  # rectangular: global negs
    assert losses.resolve_retrieval_loss("auto", 4096, 4096, "tpu") == "xla"
    # off-TPU the crossover does not apply (no Pallas kernel)
    assert losses.resolve_retrieval_loss("auto", 8192, 8192, "cpu") == "xla"


def test_auto_over_cap_picks_flash_on_tpu_chunked_elsewhere():
    b = 131072  # 128k square: 32 GB bf16 logits > 8 GiB cap
    assert losses.resolve_retrieval_loss("auto", b, b, "tpu") == "flash"
    assert losses.resolve_retrieval_loss("auto", b, b, "cpu") == "chunked"


def test_auto_respects_custom_cap():
    # tiny cap: even a small batch is "over" -> non-materializing path
    assert losses.resolve_retrieval_loss(
        "auto", 256, 256, "cpu", cap_gb=1e-6) == "chunked"
    assert losses.resolve_retrieval_loss(
        "auto", 256, 256, "tpu", cap_gb=1e-6) == "flash"


def test_forced_settings_are_honored_with_warning():
    losses._REGIME_WARNED.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # flash forced in the small regime where XLA is measured faster
        assert losses.resolve_retrieval_loss(True, 4096, 4096, "tpu") == "flash"
        assert any("measured faster" in str(x.message) for x in w)
    losses._REGIME_WARNED.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # dense forced in the regime where it cannot materialize
        b = 131072
        assert losses.resolve_retrieval_loss(False, b, b, "tpu") == "xla"
        assert any("OOM" in str(x.message) for x in w)
    # in their winning regimes, no warning
    losses._REGIME_WARNED.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert losses.resolve_retrieval_loss(False, 512, 512, "tpu") == "xla"
        assert losses.resolve_retrieval_loss(
            True, 131072, 131072, "tpu") == "flash"
        assert not w


# ---- integration: the model takes the non-materializing path ------------

def _tiny_cfg(**kw):
    return ModelConfig(embedding_dim=16, user_tower_dims=(32,),
                       item_tower_dims=(32,), cross_layers=1, dnn_dims=(16,),
                       dropout_rate=0.0, mixed_precision=False, **kw)


def _tiny_batch(b=64, n_items=64, seed=1):
    rng = np.random.default_rng(seed)
    return {
        "user_id": jnp.asarray(rng.integers(0, 40, b).astype(np.int32)),
        "movie_id": jnp.asarray(rng.integers(0, n_items, b).astype(np.int32)),
        "rating": jnp.asarray(rng.uniform(1, 5, b).astype(np.float32)),
        "y_implicit": jnp.asarray((rng.random(b) > 0.4).astype(np.float32)),
        "log_q": jnp.asarray(rng.normal(size=b).astype(np.float32)),
    }


def test_over_cap_batch_avoids_dense_logits_without_user_flag(monkeypatch):
    """With default use_flash_ce='auto' and the cap shrunk below this
    batch's logits footprint, the loss must route around
    losses.in_batch_softmax (the materializing path) on its own — the
    VERDICT r3 done-criterion ('B above the threshold picks the
    non-materializing path with no user flag')."""
    cfg = _tiny_cfg(retrieval_logits_cap_gb=1e-6)
    assert cfg.use_flash_ce == "auto"  # the default, not a user flag
    params = MultiTaskModel.init(jax.random.PRNGKey(0), cfg, 40, 64)
    batch = _tiny_batch()

    def _boom(*a, **k):  # pragma: no cover - the assertion IS the route
        raise AssertionError(
            "dense in_batch_softmax called above the materialization cap")

    monkeypatch.setattr(losses, "in_batch_softmax", _boom)
    loss, _ = MultiTaskModel.loss(params, cfg, batch, train=False)
    assert np.isfinite(float(loss))


def test_auto_over_cap_matches_dense_value_and_grads():
    """The non-materializing route is a pure implementation choice:
    same loss, same gradients as the dense default-path config."""
    cfg_dense = _tiny_cfg()
    cfg_auto = _tiny_cfg(retrieval_logits_cap_gb=1e-6)
    params = MultiTaskModel.init(jax.random.PRNGKey(0), cfg_dense, 40, 64)
    batch = _tiny_batch()
    l1, _ = MultiTaskModel.loss(params, cfg_dense, batch, train=False)
    l2, _ = MultiTaskModel.loss(params, cfg_auto, batch, train=False)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    g1 = jax.grad(
        lambda p: MultiTaskModel.loss(p, cfg_dense, batch, train=False)[0]
    )(params)
    g2 = jax.grad(
        lambda p: MultiTaskModel.loss(p, cfg_auto, batch, train=False)[0]
    )(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_chunked_global_negatives_matches_xla_in_shard_map():
    """in_batch_softmax_chunked's production role: the cross-replica
    (global-negatives) scope must match the XLA all-gather path in
    value and gradients inside shard_map."""
    from jax.sharding import PartitionSpec as P

    from recsys_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    b, d = 64, 32
    u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 40, b).astype(np.int32))
    logq = jnp.asarray(rng.normal(size=b).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=b).astype(np.float32))

    ctx = make_mesh(model_parallel=1)
    mesh, axis = ctx.mesh, ctx.data_axis

    def make_loss(chunked: bool):
        def body(ul, vl, il, ql, bl):
            fn = (losses.in_batch_softmax_chunked if chunked
                  else losses.in_batch_softmax)
            loss = fn(ul, vl, item_ids=il, log_q=ql, item_bias=bl,
                      axis_name=axis)
            return jax.lax.pmean(loss, axis)

        spec = P(axis)
        return jax.shard_map(body, mesh=mesh,
                             in_specs=(spec,) * 5, out_specs=P())

    l_c = float(make_loss(True)(u, v, ids, logq, bias))
    l_x = float(make_loss(False)(u, v, ids, logq, bias))
    np.testing.assert_allclose(l_c, l_x, rtol=1e-5)

    g_c = jax.grad(
        lambda u_, v_, b_: make_loss(True)(u_, v_, ids, logq, b_),
        argnums=(0, 1, 2))(u, v, bias)
    g_x = jax.grad(
        lambda u_, v_, b_: make_loss(False)(u_, v_, ids, logq, b_),
        argnums=(0, 1, 2))(u, v, bias)
    for a, r in zip(g_c, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-6)


def test_train_cli_retrieval_loss_flag():
    """--retrieval_loss maps onto ModelConfig.use_flash_ce."""
    import argparse

    import scripts.train as train_cli

    mapping = {"auto": "auto", "xla": False, "flash": True,
               "chunked": "chunked"}
    for flag, expect in mapping.items():
        ns = argparse.Namespace(
            use_dense_features=False, use_side_features=False,
            embedding_dim=16, cross_layers=1, ctr_weight=0.2,
            rating_weight=0.2, bf16=False, softmax_temperature=1.0,
            retrieval_loss=flag, data="x", negative_sampling="random",
            num_hard_negatives=1, num_random_negatives=1, batch_size=8,
            learning_rate=1e-3, epochs=1, resume=False, seed=0,
            global_negatives=True, model_parallel=1,
            embedding_sharding="replicated", lookup_strategy="xla",
            eval_sample=0,
        )
        cfg = train_cli.build_config(ns)
        assert cfg.model.use_flash_ce == expect, flag
