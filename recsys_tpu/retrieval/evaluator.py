"""Offline evaluator: full-metric retrieval + ranking eval on device.

Upgrades the reference's evaluator (``src/trainer.py:195-219``: 1000
sampled val rows, recall@k only, host-side ``np.dot``/``argpartition``)
to the full split with the complete metric suite (recall/precision/
ndcg/map/mrr/coverage/diversity + CTR AUC + rating RMSE), scored by the
jitted on-device top-k. ``eval_sample`` is the compat knob for the
reference's sampling behavior (seeded, like ``src/trainer.py:200``).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.config import EvalConfig, ModelConfig
from recsys_tpu.models.multitask import MultiTaskModel
from recsys_tpu.models.towers import TwoTower
from recsys_tpu.models import losses
from recsys_tpu.retrieval.metrics import RankingMetrics
from recsys_tpu.retrieval.scorer import materialize_item_embeddings, topk_scores


@functools.partial(jax.jit, static_argnames=("cfg",))
def _user_embs(params, cfg: ModelConfig, ids):
    return TwoTower.user_embed(params, ids, cfg)


@functools.partial(jax.jit, static_argnames=("k", "normalize"))
def _topk_masked(user_emb, item_embs, seen_mask, user_ids, k: int,
                 normalize: bool = True, item_bias=None):
    from recsys_tpu.retrieval.scorer import l2_normalize

    u, v = user_emb, item_embs
    if normalize:
        u = l2_normalize(u)
        v = l2_normalize(v)
    scores = jnp.dot(u, v.T, preferred_element_type=jnp.float32)
    if item_bias is not None:
        scores = scores + item_bias[None, :]
    scores = jnp.where(seen_mask[user_ids], -1e30, scores)
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _heads(params, cfg: ModelConfig, uid, mid, dense=None):
    out = MultiTaskModel.apply(params, cfg, uid, mid, dense=dense)
    return out.rating_pred, jax.nn.sigmoid(out.ctr_logit)


def evaluate(
    params: Dict,
    cfg: ModelConfig,
    bundle: Dict[str, np.ndarray],
    split: str = "val",
    eval_cfg: EvalConfig = EvalConfig(),
    seed: int = 42,
    dense: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Full metric report for one split.

    ``dense``: the split's engineered feature matrix [N, F], required by
    models with ``cfg.dense_features > 0`` (computed here from the
    bundle when not supplied — the trainer passes its cached copy)."""
    uid = bundle[f"{split}/user_id"]
    mid = bundle[f"{split}/movie_id"]
    rating = bundle[f"{split}/rating"]
    y = bundle[f"{split}/y_implicit"]
    n_items = int(bundle["meta/n_movies"])

    if cfg.dense_features > 0 and dense is None:
        from recsys_tpu.data.features import FeatureEngineer

        eng = FeatureEngineer(
            int(bundle["meta/n_users"]), n_items,
            item_genres=bundle.get("meta/movie_genres"),
        )
        dense = eng.fit_transform_splits(bundle)[split]

    if eval_cfg.eval_sample and len(uid) > eval_cfg.eval_sample:
        idx = np.random.default_rng(seed).choice(
            len(uid), eval_cfg.eval_sample, replace=False
        )
        uid, mid, rating, y = uid[idx], mid[idx], rating[idx], y[idx]
        if dense is not None:
            dense = dense[idx]

    # seen-item mask: with temporal holdout the user's next item is by
    # construction not among their train interactions, so scoring seen
    # items against the truth just measures re-recommendation noise.
    # The reference never filters (parity default False, SURVEY §3.4);
    # filter_seen=True is the standard-practice mode.
    seen_mask = None
    if eval_cfg.filter_seen:
        n_users = int(bundle["meta/n_users"])
        seen = np.zeros((n_users, n_items), bool)
        seen[bundle["train/user_id"], bundle["train/movie_id"]] = True
        seen_mask = jnp.asarray(seen)

    item_embs = materialize_item_embeddings(params["towers"], cfg, n_items)
    use_cosine = eval_cfg.score_norm == "cosine"
    item_bias = None
    if not use_cosine and "item_bias" in params["towers"]:
        item_bias = jnp.asarray(
            np.asarray(params["towers"]["item_bias"])[:n_items]
        )
    max_k = max(eval_cfg.topk)

    bs = eval_cfg.eval_batch_size
    n = len(uid)
    preds_list, rat_list, ctr_list = [], [], []
    for lo in range(0, n, bs):
        hi = min(lo + bs, n)
        # pad to full batch for a single compiled shape
        pad = bs - (hi - lo)
        u_ids = np.concatenate([uid[lo:hi], np.zeros(pad, uid.dtype)])
        m_ids = np.concatenate([mid[lo:hi], np.zeros(pad, mid.dtype)])
        u_emb = _user_embs(params["towers"], cfg, jnp.asarray(u_ids))
        if seen_mask is None:
            _, top_ids = topk_scores(
                u_emb, item_embs, max_k, normalize=use_cosine,
                item_bias=item_bias,
            )
        else:
            _, top_ids = _topk_masked(
                u_emb, item_embs, seen_mask, jnp.asarray(u_ids), max_k,
                normalize=use_cosine, item_bias=item_bias,
            )
        d_rows = None
        if dense is not None:
            d_rows = jnp.asarray(np.concatenate(
                [dense[lo:hi], np.zeros((pad, dense.shape[1]), dense.dtype)]
            ))
        r_pred, c_pred = _heads(
            params, cfg, jnp.asarray(u_ids), jnp.asarray(m_ids), d_rows
        )
        preds_list.append(np.asarray(top_ids)[: hi - lo])
        rat_list.append(np.asarray(r_pred)[: hi - lo])
        ctr_list.append(np.asarray(c_pred)[: hi - lo])

    preds = np.concatenate(preds_list)
    report = RankingMetrics.full_report(
        preds, mid, topk=eval_cfg.topk, catalog_size=n_items
    )
    r_pred = np.concatenate(rat_list)
    c_pred = np.concatenate(ctr_list)
    report["rating_rmse"] = float(np.sqrt(np.mean((r_pred - rating) ** 2)))
    if 0 < y.sum() < len(y):
        report["ctr_auc"] = _auc_host(c_pred, y)
    return report


def _auc_host(scores: np.ndarray, labels: np.ndarray) -> float:
    """Rank-sum ROC-AUC in float64 with midrank tie handling. (The
    jittable ``losses.auc`` is float32 and loses precision past ~50k
    rows — offline eval uses this host version.)"""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels) >= 0.5
    order = np.argsort(scores)
    ranks = np.empty(len(scores), np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # midranks for ties
    sorted_s = scores[order]
    i = 0
    while i < len(sorted_s):
        j = i
        while j + 1 < len(sorted_s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return float((ranks[labels].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))
