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
        if strategy not in ("random", "hard", "mixed", "mined"):
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

    def set_mined(self, table: np.ndarray) -> "NegativeSampler":
        """Install the index-mined per-user hard-negative table
        ([n_users, M] dense item ids from :func:`mine_hard_negatives`)
        for ``strategy="mined"``. TRUE hard negatives — the trained
        index's top-scoring non-positives per user — upgrading the
        reference's popularity-"hard" notion
        (``src/data_processing.py:300-312``)."""
        self.mined_table = np.asarray(table, np.int32)
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
        if self.strategy == "mined":
            # per-step random subset of each user's mined pool (keeps
            # successive epochs from re-presenting the identical
            # negative columns) + uniform-random tail, mixed-style
            table = self.mined_table  # [n_users, M]
            m = table.shape[1]
            n_h = min(self.num_hard, m)
            cols = self.rng.integers(0, m, (b, n_h))
            parts.append(np.take_along_axis(
                table[user_ids], cols, axis=1).astype(np.int32))
            parts.append(
                self.rng.integers(0, self.n_items, (b, self.num_random))
                .astype(np.int32))
            return np.concatenate(parts, axis=1)
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


def mine_hard_negatives(
    tower_params,
    model_cfg,
    bundle: Dict[str, np.ndarray],
    m: int = 50,
    batch: int = 1024,
    skip_top: int = 0,
) -> np.ndarray:
    """Mine TRUE per-user hard negatives from a trained index: ranks
    ``[skip_top, skip_top + m)`` of the seen-filtered items by the
    model's own retrieval logit (dot + learned item bias — what serving
    would actually retrieve).

    Upgrades the reference's popularity-"hard" strategy
    (``src/data_processing.py:300-312`` ranks by global popularity) to
    the standard trained-index mining step: items the CURRENT model
    scores highly for THIS user but that the user never interacted
    with — exactly the confusable candidates the explicit-negatives
    loss (``losses.sampled_softmax_explicit``) should push down.

    ``skip_top``: the index's head ranks are where the user's actual
    held-out next items live (they are unseen by construction), so
    mining rank 0 turns future positives into negatives — measured
    -35% recall@10 (negatives_mined.json arm 2). Skipping the head is
    the standard false-negative mitigation.

    -> [n_users, m] dense item ids (clamped, with a warning, to the
    widest non-empty rank window a smaller catalog allows); feed
    ``NegativeSampler.set_mined``.
    """
    import jax
    import jax.numpy as jnp

    from recsys_tpu.models.towers import TwoTower
    from recsys_tpu.retrieval.evaluator import SeenIndex, _topk_batch_masked
    from recsys_tpu.retrieval.scorer import materialize_item_embeddings

    n_users = int(bundle["meta/n_users"])
    n_items = int(bundle["meta/n_movies"])
    seen = SeenIndex(bundle["train/user_id"], bundle["train/movie_id"],
                     n_users, n_items)
    item_embs = materialize_item_embeddings(tower_params, model_cfg, n_items)
    bias = jnp.asarray(np.asarray(tower_params["item_bias"])[:n_items])

    # tiny-catalog clamp: keep a non-empty pool ending inside the
    # catalog (skip as much of the head as fits, then as many columns
    # as remain — a catalog smaller than skip_top+m yields a shallower
    # pool, loudly)
    eff_skip = max(0, min(skip_top, n_items - m))
    k_mine = min(eff_skip + m, n_items)
    if eff_skip != skip_top or k_mine - eff_skip != m:
        import logging

        logging.getLogger(__name__).warning(
            "mine_hard_negatives: catalog of %d items clamps the "
            "requested ranks [%d, %d) to [%d, %d)",
            n_items, skip_top, skip_top + m, eff_skip, k_mine)
    skip_top = eff_skip

    @jax.jit
    def _mine_chunk(uids, mask):
        u_emb = TwoTower.user_embed(tower_params, uids, model_cfg)
        _, top = _topk_batch_masked(u_emb, item_embs, mask, k_mine,
                                    normalize=False, item_bias=bias)
        return top[:, skip_top:]

    out = np.empty((n_users, k_mine - skip_top), np.int32)
    for lo in range(0, n_users, batch):
        chunk = np.arange(lo, min(lo + batch, n_users), dtype=np.int32)
        pad = batch - len(chunk)
        padded = np.concatenate([chunk, np.zeros(pad, np.int32)])
        mask = jnp.asarray(seen.batch_mask(padded))
        out[chunk] = np.asarray(_mine_chunk(jnp.asarray(padded), mask))[
            : len(chunk)]
    return out
