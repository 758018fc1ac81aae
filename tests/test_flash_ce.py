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


def test_global_negatives_flash_matches_xla_in_shard_map(data):
    """Rectangular flash (local rows x all-gathered candidates) inside
    shard_map must match the XLA global-negatives path in value AND
    gradients — the round-2 gate (`use_flash_ce and not
    global_negatives`) is gone; this is the path that replaces it."""
    from jax.sharding import PartitionSpec as P

    from recsys_tpu.parallel.mesh import make_mesh

    ctx = make_mesh(model_parallel=1)  # all 8 devices on 'data'
    mesh, axis = ctx.mesh, ctx.data_axis
    u, v, ids = data["u"], data["v"], data["ids"]
    logq, bias = data["logq"], data["bias"]

    def make_loss(flash: bool):
        def body(ul, vl, il, ql, bl):
            if flash:
                loss = in_batch_softmax_flash(
                    ul, vl, il, log_q=ql, item_bias=bl, axis_name=axis)
            else:
                loss = losses.in_batch_softmax(
                    ul, vl, item_ids=il, log_q=ql, item_bias=bl,
                    axis_name=axis)
            return jax.lax.pmean(loss, axis)

        spec = P(axis)
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec, spec, spec, spec, spec),
            out_specs=P(),
        )

    l_flash = float(make_loss(True)(u, v, ids, logq, bias))
    l_xla = float(make_loss(False)(u, v, ids, logq, bias))
    np.testing.assert_allclose(l_flash, l_xla, rtol=1e-6)

    g_flash = jax.grad(
        lambda u_, v_, b_: make_loss(True)(u_, v_, ids, logq, b_),
        argnums=(0, 1, 2),
    )(u, v, bias)
    g_xla = jax.grad(
        lambda u_, v_, b_: make_loss(False)(u_, v_, ids, logq, b_),
        argnums=(0, 1, 2),
    )(u, v, bias)
    for a, r in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-6)


def test_flash_bf16_forced_matches_dense_small_batch(data):
    """bf16=True (the same cast 'auto' applies at n_cand >= 8192) must
    track the fp32 dense reference within bf16 tolerance — value and
    gradients (ADVICE r3: the flash bf16 policy casts the u/v embedding
    operands, stronger than the XLA path's logits-only bf16)."""
    u, v, ids = data["u"], data["v"], data["ids"]
    logq, bias = data["logq"], data["bias"]
    a = float(in_batch_softmax_flash(
        u, v, ids, log_q=logq, item_bias=bias, bf16=True))
    r = float(losses.in_batch_softmax(
        u, v, item_ids=ids, log_q=logq, item_bias=bias))
    np.testing.assert_allclose(a, r, rtol=2e-2)
    ga = jax.grad(
        lambda u_, v_: in_batch_softmax_flash(
            u_, v_, ids, log_q=logq, item_bias=bias, bf16=True),
        argnums=(0, 1),
    )(u, v)
    gr = jax.grad(
        lambda u_, v_: losses.in_batch_softmax(
            u_, v_, item_ids=ids, log_q=logq, item_bias=bias),
        argnums=(0, 1),
    )(u, v)
    for x, y in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-2, atol=2e-2)


def test_flash_bf16_auto_threshold():
    """'auto' casts the embeddings exactly when n_cand >= 8192: below
    the threshold it is bit-identical to bf16=False, at the threshold
    bit-identical to bf16=True — and the bf16 value still tracks the
    fp32 dense reference at that scale (the previously-untested
    n_cand >= 8192 parity, ADVICE r3)."""
    rng = np.random.default_rng(7)
    d = 16

    # below threshold: auto == off
    b_small = 64
    u = jnp.asarray(rng.normal(size=(b_small, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b_small, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 10_000, b_small).astype(np.int32))
    auto = float(in_batch_softmax_flash(u, v, ids, bf16="auto"))
    off = float(in_batch_softmax_flash(u, v, ids, bf16=False))
    assert auto == off

    # at threshold: auto == forced bf16, and both track fp32 dense
    b_big = 8192
    u = jnp.asarray(rng.normal(size=(b_big, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b_big, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 1_000_000, b_big).astype(np.int32))
    auto = float(in_batch_softmax_flash(u, v, ids, bf16="auto"))
    forced = float(in_batch_softmax_flash(u, v, ids, bf16=True))
    assert auto == forced
    dense_f32 = float(losses.in_batch_softmax(u, v, item_ids=ids))
    np.testing.assert_allclose(auto, dense_f32, rtol=2e-2)


def test_rectangular_positive_column_semantics():
    """Direct rectangular check against a dense NumPy computation:
    Bq=8 rows against Bk=32 candidates with positives at offset 16."""
    from recsys_tpu.ops.pallas.flash_ce import flash_softmax_ce

    rng = np.random.default_rng(3)
    bq, bk, d = 8, 32, 16
    u = rng.normal(size=(bq, d)).astype(np.float32)
    v = rng.normal(size=(bk, d)).astype(np.float32)
    corr = rng.normal(size=bk).astype(np.float32)
    ids_k = rng.integers(0, 12, bk).astype(np.int32)
    pos = (np.arange(bq) + 16).astype(np.int32)
    ids_q = ids_k[pos]

    ce = np.asarray(flash_softmax_ce(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(corr),
        jnp.asarray(ids_q), jnp.asarray(ids_k), jnp.asarray(pos)))

    logits = u @ v.T + corr[None, :]
    dup = ids_q[:, None] == ids_k[None, :]
    not_pos = np.arange(bk)[None, :] != pos[:, None]
    logits = np.where(dup & not_pos, -1e9, logits)
    lse = np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1)) \
        + logits.max(1)
    ref = lse - logits[np.arange(bq), pos]
    np.testing.assert_allclose(ce, ref, rtol=1e-5, atol=1e-6)
