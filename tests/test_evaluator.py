"""Evaluator tests: filter_seen masking, score_norm modes, eval_sample,
host AUC correctness."""

import jax
import numpy as np
import pytest

from recsys_tpu.config import EvalConfig, ModelConfig
from recsys_tpu.models.multitask import MultiTaskModel
from recsys_tpu.retrieval.evaluator import _auc_host, evaluate

CFG = ModelConfig(
    embedding_dim=16, user_tower_dims=(32,), item_tower_dims=(32,),
    cross_layers=1, dnn_dims=(16,), dropout_rate=0.0, mixed_precision=False,
)


@pytest.fixture(scope="module")
def params(tiny_bundle):
    return MultiTaskModel.init(
        jax.random.PRNGKey(0), CFG,
        int(tiny_bundle["meta/n_users"]), int(tiny_bundle["meta/n_movies"]),
    )


def test_filter_seen_excludes_train_items(tiny_bundle, params):
    """With filter_seen, the top-k for a user must not contain any of
    that user's train items (checked directly via the masked scorer)."""
    import jax.numpy as jnp

    from recsys_tpu.models.towers import TwoTower
    from recsys_tpu.retrieval.evaluator import _topk_masked
    from recsys_tpu.retrieval.scorer import materialize_item_embeddings

    n_users = int(tiny_bundle["meta/n_users"])
    n_items = int(tiny_bundle["meta/n_movies"])
    seen = np.zeros((n_users, n_items), bool)
    seen[tiny_bundle["train/user_id"], tiny_bundle["train/movie_id"]] = True
    item_embs = materialize_item_embeddings(params["towers"], CFG, n_items)
    uids = jnp.arange(16)
    u_emb = TwoTower.user_embed(params["towers"], uids, CFG)
    _, top = _topk_masked(u_emb, item_embs, jnp.asarray(seen), uids, 10)
    top = np.asarray(top)
    for u in range(16):
        assert not seen[u, top[u]].any()
    # and the report still computes
    rep = evaluate(params, CFG, tiny_bundle, "val",
                   EvalConfig(topk=(10,), eval_batch_size=256,
                              filter_seen=True))
    assert 0.0 <= rep["recall@10"] <= 1.0


def test_score_norm_modes_run(tiny_bundle, params):
    for mode in ("cosine", "dot"):
        rep = evaluate(params, CFG, tiny_bundle, "val",
                       EvalConfig(topk=(5,), eval_batch_size=256,
                                  score_norm=mode))
        assert 0.0 <= rep["recall@5"] <= 1.0


def test_eval_sample_reduces_rows(tiny_bundle, params):
    rep = evaluate(params, CFG, tiny_bundle, "val",
                   EvalConfig(topk=(5,), eval_batch_size=64, eval_sample=100))
    assert np.isfinite(rep["rating_rmse"])


def test_invalid_score_norm_rejected():
    with pytest.raises(ValueError):
        EvalConfig(score_norm="euclid")


def test_auc_host_vs_sklearn_large():
    rng = np.random.default_rng(0)
    n = 120_000  # size where the fp32 rank-sum overflowed
    scores = rng.normal(size=n)
    labels = (rng.random(n) < 1 / (1 + np.exp(-scores))).astype(np.float32)
    from sklearn.metrics import roc_auc_score

    got = _auc_host(scores, labels)
    np.testing.assert_allclose(got, roc_auc_score(labels, scores), atol=1e-9)
    assert 0.0 <= got <= 1.0


def test_auc_host_with_ties():
    scores = np.array([0.5, 0.5, 0.5, 0.1])
    labels = np.array([1.0, 0.0, 1.0, 0.0])
    from sklearn.metrics import roc_auc_score

    np.testing.assert_allclose(
        _auc_host(scores, labels), roc_auc_score(labels, scores), atol=1e-12
    )
