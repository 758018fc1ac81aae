"""Explicit negative sampling (random / hard / mixed).

Capability parity with ``NegativeSampler`` (``src/data_processing.py:282-337``):
``random`` = uniform over unseen items, ``hard`` = most-popular unseen,
``mixed`` = top-popular ``n_hard`` + uniform ``n_random`` from the rest.

Note the reference *builds* this sampler but trains only with in-batch
softmax negatives (``src/trainer.py:79`` — ``sample_negatives`` is never
called; the real negatives come from ``tfrs.tasks.Retrieval`` at
``src/models.py:116``). Here the explicit-negatives path is a real,
tested training option (SURVEY §7.3 "parity traps"), implemented
vectorized and emitting fixed-shape arrays for jit-ability.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class NegativeSampler:
    def __init__(
        self,
        strategy: str = "random",
        num_hard: int = 5,
        num_random: int = 10,
        seed: int = 42,
    ):
        if strategy not in ("random", "hard", "mixed"):
            raise ValueError(f"unknown strategy {strategy!r}")
        self.strategy = strategy
        self.num_hard = num_hard
        self.num_random = num_random
        self.rng = np.random.default_rng(seed)
        self.item_popularity: Optional[np.ndarray] = None
        self.user_seen: Dict[int, np.ndarray] = {}
        self.n_items = 0

    def fit(self, user_ids: np.ndarray, item_ids: np.ndarray, n_items: int) -> "NegativeSampler":
        """Build item popularity + per-user seen sets from train
        interactions (dense int ids)."""
        self.n_items = n_items
        self.item_popularity = np.bincount(item_ids, minlength=n_items).astype(np.int64)
        order = np.argsort(user_ids, kind="stable")
        u_sorted, i_sorted = user_ids[order], item_ids[order]
        bounds = np.searchsorted(u_sorted, np.arange(u_sorted.max() + 2))
        for u in np.unique(u_sorted):
            self.user_seen[int(u)] = np.unique(i_sorted[bounds[u] : bounds[u + 1]])
        self._pop_order = np.argsort(-self.item_popularity, kind="stable")
        return self

    def n_negatives(self) -> int:
        if self.strategy == "random":
            return self.num_random
        if self.strategy == "hard":
            return self.num_hard
        return self.num_hard + self.num_random

    def sample_negatives(self, user_id: int) -> np.ndarray:
        """Fixed-length negative item array for one user (with
        replacement fallback if the unseen pool is small)."""
        assert self.item_popularity is not None, "call fit() first"
        seen = self.user_seen.get(int(user_id), np.empty(0, np.int64))
        k = self.n_negatives()
        out = np.empty(0, np.int64)
        if self.strategy in ("hard", "mixed"):
            hard_pool = self._pop_order[~np.isin(self._pop_order, seen)][: max(self.num_hard * 4, 32)]
            n_h = self.num_hard if self.strategy == "mixed" else k
            out = hard_pool[:n_h]
        if self.strategy in ("random", "mixed"):
            n_r = self.num_random if self.strategy == "mixed" else k
            cand = self.rng.integers(0, self.n_items, n_r * 3)
            cand = cand[~np.isin(cand, seen) & ~np.isin(cand, out)][:n_r]
            while len(cand) < n_r:  # degenerate tiny-catalog fallback
                cand = np.concatenate([cand, self.rng.integers(0, self.n_items, n_r)])[:n_r]
            out = np.concatenate([out, cand])
        if len(out) < k:
            out = np.concatenate([out, self.rng.integers(0, self.n_items, k - len(out))])
        return out[:k].astype(np.int32)

    def sample_batch(self, user_ids: np.ndarray) -> np.ndarray:
        """[B] -> [B, n_negatives] int32 (static shape for jit).

        Vectorized: hard negatives come from a per-user cache built on
        first use (top-popular unseen, computed once); random negatives
        are uniform draws WITHOUT a seen-filter — with ML-1M sparsity a
        draw collides with a seen item <5% of the time, and accidental
        positives in sampled softmax are standard practice (the strict
        per-user path remains available via ``sample_negatives``)."""
        b = len(user_ids)
        parts = []
        if self.strategy in ("hard", "mixed"):
            n_h = self.num_hard if self.strategy == "mixed" else self.n_negatives()
            if not hasattr(self, "_hard_cache"):
                self._build_hard_cache()
            parts.append(self._hard_cache[user_ids][:, :n_h])
        if self.strategy in ("random", "mixed"):
            n_r = self.num_random if self.strategy == "mixed" else self.n_negatives()
            parts.append(
                self.rng.integers(0, self.n_items, (b, n_r)).astype(np.int32)
            )
        return np.concatenate(parts, axis=1)

    def _build_hard_cache(self) -> None:
        """Per-user top-popular-unseen negatives, one pass over users."""
        n_h = max(self.num_hard, 1)
        max_u = max(self.user_seen.keys(), default=0)
        cache = np.tile(self._pop_order[:n_h].astype(np.int32), (max_u + 1, 1))
        head = self._pop_order[: n_h * 8]
        for u, seen in self.user_seen.items():
            pool = head[~np.isin(head, seen)][:n_h]
            if len(pool) == n_h:
                cache[u] = pool
        self._hard_cache = cache
