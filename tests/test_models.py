"""Model-layer tests: golden numbers for DCN cross and losses,
partial-input contract, forward shapes/determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.config import ModelConfig
from recsys_tpu.models import layers as L
from recsys_tpu.models import losses
from recsys_tpu.models.dcn import DeepCrossNetwork
from recsys_tpu.models.multitask import MultiTaskModel
from recsys_tpu.models.towers import TwoTower

CFG = ModelConfig(
    embedding_dim=16,
    user_tower_dims=(32, 16),
    item_tower_dims=(32, 16),
    cross_layers=2,
    dnn_dims=(32, 8),
    dropout_rate=0.0,
    mixed_precision=False,
)


def test_dense_golden():
    p = {"w": jnp.array([[1.0, 2.0], [3.0, 4.0]]), "b": jnp.array([0.5, -0.5])}
    y = L.dense(p, jnp.array([[1.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(y), [[4.5, 5.5]])


def test_dcn_cross_golden():
    """Hand-computed rank-1 cross: x1 = x0*(x0.w) + b + x0."""
    cfg = ModelConfig(cross_layers=1, dnn_dims=(), mixed_precision=False)
    x0 = jnp.array([[1.0, 2.0]])
    params = {
        "cross": {"layer_0": {"w": jnp.array([0.5, -1.0]), "b": jnp.array([0.1, 0.2])}},
        "deep": {},
    }
    out = DeepCrossNetwork.apply(params, x0, cfg)
    # x0.w = 0.5 - 2.0 = -1.5 ; x1 = [1,2]*(-1.5) + [0.1,0.2] + [1,2]
    np.testing.assert_allclose(np.asarray(out), [[-0.4, -0.8]], atol=1e-6)


def test_dcn_output_dim_and_deep():
    key = jax.random.PRNGKey(0)
    params = DeepCrossNetwork.init(key, CFG, 32)
    x = jax.random.normal(key, (4, 32))
    out = DeepCrossNetwork.apply(params, x, CFG)
    assert out.shape == (4, DeepCrossNetwork.output_dim(CFG, 32)) == (4, 40)
    # deep branch output is post-relu -> non-negative
    assert np.asarray(out)[:, 32:].min() >= 0.0


def test_in_batch_softmax_golden():
    u = jnp.eye(3)
    v = jnp.eye(3) * 2.0
    got = losses.in_batch_softmax(u, v)
    logits = np.eye(3) * 2.0
    p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    expect = -np.log(np.diag(p)).mean()
    np.testing.assert_allclose(float(got), expect, rtol=1e-6)


def test_in_batch_softmax_accidental_hits():
    """Duplicate item in batch must not be punished as a negative."""
    v_row = jnp.array([[1.0, 0.0]])
    u = jnp.concatenate([v_row, v_row])  # two users, same item
    v = jnp.concatenate([v_row, v_row])
    ids = jnp.array([7, 7])
    with_mask = float(losses.in_batch_softmax(u, v, item_ids=ids))
    without = float(losses.in_batch_softmax(u, v))
    assert with_mask < without  # masking removes the duplicate-negative penalty
    # with masking, each row is effectively a 1-way softmax -> loss ~ 0
    assert with_mask < 1e-3


def test_weighted_bce_golden():
    logits = jnp.array([0.0, 0.0])
    labels = jnp.array([1.0, 0.0])
    # unweighted: -log(0.5) each
    got = losses.weighted_bce_logits(logits, labels, 1.0, 1.0)
    np.testing.assert_allclose(float(got), np.log(2.0), rtol=1e-6)
    # pos_weight 3: weighted mean = (3*log2 + log2)/4 = log2
    got_w = losses.weighted_bce_logits(logits, labels, 3.0, 1.0)
    np.testing.assert_allclose(float(got_w), np.log(2.0), rtol=1e-6)
    # check weighting actually changes an asymmetric case
    labels2 = jnp.array([1.0, 1.0])
    a = float(losses.weighted_bce_logits(jnp.array([2.0, -2.0]), labels2, 1.0, 1.0))
    b = float(losses.weighted_bce_logits(jnp.array([2.0, -2.0]), labels2, 5.0, 1.0))
    np.testing.assert_allclose(a, b, rtol=1e-6)  # all-pos: weights cancel in mean


def test_balanced_class_weights_vs_sklearn():
    y = np.array([1.0, 1.0, 1.0, 0.0])
    w_pos, w_neg = losses.balanced_class_weights(y)
    from sklearn.utils.class_weight import compute_class_weight

    ref = compute_class_weight("balanced", classes=np.array([0.0, 1.0]), y=y)
    np.testing.assert_allclose([w_neg, w_pos], ref)


def test_auc_vs_sklearn():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=500).astype(np.float32)
    labels = (rng.random(500) < jax.nn.sigmoid(scores)).astype(np.float32)
    from sklearn.metrics import roc_auc_score

    got = float(losses.auc(jnp.array(scores), jnp.array(labels)))
    ref = roc_auc_score(labels, scores)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_two_tower_partial_input():
    key = jax.random.PRNGKey(1)
    params = TwoTower.init(key, CFG, n_users=10, n_items=20)
    u, v = TwoTower.apply(params, CFG, user_ids=jnp.array([0, 1]))
    assert u is not None and v is None and u.shape == (2, 16)
    u2, v2 = TwoTower.apply(params, CFG, item_ids=jnp.array([3]))
    assert u2 is None and v2.shape == (1, 16)
    # OOV ids clip to the OOV row
    oov = TwoTower.item_embed(params, jnp.array([999]), CFG)
    oov_row = TwoTower.item_embed(params, jnp.array([20]), CFG)
    np.testing.assert_array_equal(np.asarray(oov), np.asarray(oov_row))


def test_multitask_loss_runs_and_grads():
    key = jax.random.PRNGKey(2)
    params = MultiTaskModel.init(key, CFG, n_users=10, n_items=20)
    batch = {
        "user_id": jnp.array([0, 1, 2, 3]),
        "movie_id": jnp.array([5, 6, 7, 8]),
        "rating": jnp.array([4.0, 3.0, 5.0, 1.0]),
        "y_implicit": jnp.array([1.0, 0.0, 1.0, 0.0]),
    }
    (total, metrics), grads = jax.value_and_grad(
        MultiTaskModel.loss, has_aux=True
    )(params, CFG, batch, key=key, class_weights=(1.2, 0.8))
    assert np.isfinite(float(total))
    assert set(metrics) == {"loss", "retrieval_loss", "rating_mse", "ctr_bce", "l2"}
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # embedding rows not in the batch get zero grad (gather transpose)
    ut_grad = np.asarray(grads["towers"]["user_table"])
    assert np.abs(ut_grad[9]).sum() == 0.0
    assert np.abs(ut_grad[0]).sum() > 0.0


def test_multitask_explicit_negatives_path():
    key = jax.random.PRNGKey(3)
    params = MultiTaskModel.init(key, CFG, n_users=10, n_items=20)
    batch = {
        "user_id": jnp.array([0, 1]),
        "movie_id": jnp.array([5, 6]),
        "rating": jnp.array([4.0, 3.0]),
        "y_implicit": jnp.array([1.0, 0.0]),
    }
    negs = jnp.array([[1, 2, 3], [4, 5, 6]])
    total, m = MultiTaskModel.loss(params, CFG, batch, neg_item_ids=negs)
    total0, _ = MultiTaskModel.loss(params, CFG, batch)
    assert float(m["retrieval_loss"]) > float(total0 * 0)  # runs
    assert float(total) != float(total0)


def test_dropout_active_only_in_train():
    cfg = ModelConfig(
        embedding_dim=16, user_tower_dims=(32,), item_tower_dims=(32,),
        dropout_rate=0.5, mixed_precision=False,
    )
    key = jax.random.PRNGKey(4)
    params = TwoTower.init(key, cfg, 10, 10)
    ids = jnp.arange(8)
    a = TwoTower.user_embed(params, ids, cfg, train=False)
    b = TwoTower.user_embed(params, ids, cfg, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # eval deterministic
    c = TwoTower.user_embed(params, ids, cfg, train=True, key=key)
    assert not np.allclose(np.asarray(a), np.asarray(c))  # train perturbs


def test_mixed_precision_close_to_fp32():
    cfg_bf = ModelConfig(embedding_dim=32, mixed_precision=True, dropout_rate=0.0)
    cfg_fp = ModelConfig(embedding_dim=32, mixed_precision=False, dropout_rate=0.0)
    key = jax.random.PRNGKey(5)
    params = MultiTaskModel.init(key, cfg_fp, 50, 50)
    batch_ids = (jnp.arange(8), jnp.arange(8) + 10)
    out_bf = MultiTaskModel.apply(params, cfg_bf, *batch_ids)
    out_fp = MultiTaskModel.apply(params, cfg_fp, *batch_ids)
    assert out_bf.user_embedding.dtype == jnp.float32  # outputs upcast
    np.testing.assert_allclose(
        np.asarray(out_bf.rating_pred), np.asarray(out_fp.rating_pred),
        rtol=0.1, atol=0.15,
    )


def test_chunked_softmax_matches_dense():
    """Flash-style chunked CE == dense in-batch softmax (values and
    gradients), including logQ, bias, and accidental-hit masking."""
    rng = np.random.default_rng(7)
    b, d = 64, 16
    u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 40, b))  # duplicates guaranteed
    log_q = jnp.asarray(rng.normal(size=b).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=b).astype(np.float32))

    def dense(u, v):
        return losses.in_batch_softmax(u, v, item_ids=ids, log_q=log_q,
                                       item_bias=bias)

    def chunked(u, v):
        return losses.in_batch_softmax_chunked(u, v, item_ids=ids,
                                               log_q=log_q, item_bias=bias,
                                               chunk_size=16)

    np.testing.assert_allclose(float(dense(u, v)), float(chunked(u, v)),
                               rtol=1e-5)
    gd = jax.grad(lambda a, b2: dense(a, b2), argnums=(0, 1))(u, v)
    gc = jax.grad(lambda a, b2: chunked(a, b2), argnums=(0, 1))(u, v)
    for a, c in zip(gd, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)
    # masked variant
    m = jnp.asarray((rng.random(b) > 0.3).astype(np.float32))
    d1 = losses.in_batch_softmax(u, v, item_ids=ids, mask=m)
    d2 = losses.in_batch_softmax_chunked(u, v, item_ids=ids, mask=m,
                                         chunk_size=16)
    np.testing.assert_allclose(float(d1), float(d2), rtol=1e-5)


def test_in_batch_softmax_bf16_logits_close():
    """logits_dtype=bfloat16 (the large-batch HBM-traffic optimization)
    matches the f32 loss and gradients to bf16 tolerance."""
    import jax
    import jax.numpy as jnp

    from recsys_tpu.models.losses import in_batch_softmax

    rng = np.random.default_rng(0)
    b, d = 256, 32
    u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 200, b).astype(np.int32))
    log_q = jnp.asarray(rng.normal(size=b).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=b).astype(np.float32) * 0.1)

    def loss(dt):
        return lambda u, v: in_batch_softmax(
            u, v, item_ids=ids, log_q=log_q, item_bias=bias,
            logits_dtype=dt,
        )

    l32, g32 = jax.value_and_grad(loss(None), argnums=(0, 1))(u, v)
    l16, g16 = jax.value_and_grad(loss(jnp.bfloat16), argnums=(0, 1))(u, v)
    assert np.isfinite(float(l16))
    assert abs(float(l32) - float(l16)) < 0.05
    for a, bgrad in zip(g32, g16):
        denom = np.maximum(np.abs(np.asarray(a)), 1e-2)
        rel = np.abs(np.asarray(a) - np.asarray(bgrad)) / denom
        assert np.median(rel) < 0.1


@pytest.mark.slow  # >40s: heavy SPMD/CLI lane (ROUND4 item 8)
def test_ablation_flags_reproduce_plain_retrieval_loss():
    """use_item_bias=False + accidental_hit_mask=False (+ no log_q in
    the batch) must make the retrieval term exactly the reference's
    plain tfrs Retrieval: CE over U@V.T with diagonal labels, no
    corrections (the BASELINE.md attribution ablation)."""
    import dataclasses

    import jax

    from recsys_tpu.models.multitask import MultiTaskModel

    cfg = ModelConfig(embedding_dim=8, user_tower_dims=(16,),
                      item_tower_dims=(16,), cross_layers=1, dnn_dims=(8,),
                      dropout_rate=0.0, mixed_precision=False)
    cfg_ab = dataclasses.replace(cfg, use_item_bias=False,
                                 accidental_hit_mask=False)
    params = MultiTaskModel.init(jax.random.PRNGKey(0), cfg, 30, 40)
    rng = np.random.default_rng(2)
    b = 32
    batch = {
        # duplicate items on purpose: masking-off must score them as
        # ordinary negatives
        "user_id": jnp.asarray(rng.integers(0, 30, b).astype(np.int32)),
        "movie_id": jnp.asarray(rng.integers(0, 6, b).astype(np.int32)),
        "rating": jnp.asarray(rng.uniform(1, 5, b).astype(np.float32)),
        "y_implicit": jnp.asarray((rng.random(b) > 0.5).astype(np.float32)),
    }
    _, m_ab = MultiTaskModel.loss(params, cfg_ab, batch, train=False)
    out = MultiTaskModel.apply(params, cfg, batch["user_id"],
                               batch["movie_id"], train=False)
    u, v = np.asarray(out.user_embedding), np.asarray(out.item_embedding)
    logits = u @ v.T
    lse = np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1)) \
        + logits.max(1)
    plain_ce = float(np.mean(lse - np.diag(logits)))
    np.testing.assert_allclose(float(m_ab["retrieval_loss"]), plain_ce,
                               rtol=1e-5)
    # and the full config must differ (bias + masking are live)
    _, m_full = MultiTaskModel.loss(params, cfg, batch, train=False)
    assert abs(float(m_full["retrieval_loss"]) - plain_ce) > 1e-6
    # no gradient reaches item_bias when ablated
    g = jax.grad(lambda p: MultiTaskModel.loss(p, cfg_ab, batch,
                                               train=False)[0])(params)
    assert float(np.abs(np.asarray(g["towers"]["item_bias"])).max()) == 0.0
