"""Retrieval layer: on-device scoring/top-k (the FAISS replacement),
ranking-metric library, and the offline evaluator."""

from recsys_tpu.retrieval.metrics import RankingMetrics
from recsys_tpu.retrieval.scorer import RetrievalIndex, topk_scores

__all__ = ["RankingMetrics", "RetrievalIndex", "topk_scores"]
