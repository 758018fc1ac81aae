"""Ranking metric library (C10 parity, vectorized over int ids).

Semantics follow ``AdvancedMetrics`` (``src/evaluation.py:22-104``):
one relevant item per evaluation row; predictions are ranked id lists.

* ``recall_at_k``    — hit rate in top-k (``:22-33``)
* ``precision_at_k`` — hits/k (``:36-46``; = recall/k with one relevant)
* ``ndcg_at_k``      — dcg with idcg = 1/log2(2) = 1, i.e. ndcg =
  1/log2(rank+2) for a hit (the reference's single-relevant quirk at
  ``:49-63`` is kept deliberately for metric parity)
* ``map_at_k``       — AP = 1/rank for a hit within k (``:66-78``)
* ``mrr``            — reciprocal rank over the full list (``:81-89``)
* ``coverage``       — fraction of catalog ever recommended (``:92-97``)
* ``diversity``      — mean(unique/len) within each list (``:100-104``)

Unlike the reference (instantiated but never called by the trainer,
``src/trainer.py:56``), these ARE wired into the evaluator
(``recsys_tpu.retrieval.evaluator``).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def _ranks(predictions: np.ndarray, truth: np.ndarray) -> np.ndarray:
    """0-based rank of the true item in each prediction row; -1 = miss.

    predictions: [N, K] int ids (ranked), truth: [N] int ids.
    """
    hits = predictions == truth[:, None]
    any_hit = hits.any(axis=1)
    first = hits.argmax(axis=1)
    return np.where(any_hit, first, -1)


class RankingMetrics:
    @staticmethod
    def recall_at_k(predictions: np.ndarray, truth: np.ndarray, k: int) -> float:
        r = _ranks(predictions[:, :k], truth)
        return float((r >= 0).mean())

    @staticmethod
    def precision_at_k(predictions: np.ndarray, truth: np.ndarray, k: int) -> float:
        r = _ranks(predictions[:, :k], truth)
        return float((r >= 0).mean() / k)

    @staticmethod
    def ndcg_at_k(predictions: np.ndarray, truth: np.ndarray, k: int) -> float:
        r = _ranks(predictions[:, :k], truth)
        dcg = np.where(r >= 0, 1.0 / np.log2(np.maximum(r, 0) + 2.0), 0.0)
        return float(dcg.mean())  # idcg == 1 (reference quirk, src/evaluation.py:52)

    @staticmethod
    def map_at_k(predictions: np.ndarray, truth: np.ndarray, k: int) -> float:
        r = _ranks(predictions[:, :k], truth)
        ap = np.where(r >= 0, 1.0 / (np.maximum(r, 0) + 1.0), 0.0)
        return float(ap.mean())

    @staticmethod
    def mrr(predictions: np.ndarray, truth: np.ndarray) -> float:
        r = _ranks(predictions, truth)
        return float(np.where(r >= 0, 1.0 / (np.maximum(r, 0) + 1.0), 0.0).mean())

    @staticmethod
    def coverage(predictions: np.ndarray, catalog_size: int) -> float:
        return float(len(np.unique(predictions)) / max(catalog_size, 1))

    @staticmethod
    def diversity(predictions: np.ndarray) -> float:
        k = predictions.shape[1]
        uniq = np.array([len(np.unique(row)) for row in predictions])
        return float((uniq / k).mean())

    @staticmethod
    def full_report(
        predictions: np.ndarray,
        truth: np.ndarray,
        topk: Sequence[int] = (5, 10, 20, 50),
        catalog_size: int = 0,
    ) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for k in topk:
            kk = min(k, predictions.shape[1])
            out[f"recall@{k}"] = RankingMetrics.recall_at_k(predictions, truth, kk)
            out[f"precision@{k}"] = RankingMetrics.precision_at_k(predictions, truth, kk)
            out[f"ndcg@{k}"] = RankingMetrics.ndcg_at_k(predictions, truth, kk)
            out[f"map@{k}"] = RankingMetrics.map_at_k(predictions, truth, kk)
        out["mrr"] = RankingMetrics.mrr(predictions, truth)
        if catalog_size:
            out["coverage"] = RankingMetrics.coverage(predictions, catalog_size)
        out["diversity"] = RankingMetrics.diversity(predictions)
        return out
