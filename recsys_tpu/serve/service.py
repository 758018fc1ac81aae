"""Recommendation services (the ``app/recommendation_service.py`` and
``app/simple_model_loader.py`` replacements).

* :class:`RecommendationService` — loads the inference bundle
  (``encoder.npz`` + ``vocabs.json`` + ``config.json`` + ``index.npz``,
  the artifact set written by ``train.checkpoint.save_inference_bundle``)
  and serves top-k via the jitted on-device scorer instead of FAISS
  (parity: ``app/recommendation_service.py:18-110``).
* :class:`StubRecommendationService` — model-free degraded-mode stand-in
  with deterministic seeded random embeddings (parity:
  ``app/simple_model_loader.py:15-179``).

Contract notes (SURVEY §3.4):
* ``recommend`` uses cosine scores (both sides L2-normalized), matching
  the reference's ``faiss.normalize_L2`` + ``IndexFlatIP``;
* ``score`` uses the raw un-normalized dot product, matching the
  reference's ``tf.linalg.matvec`` — the asymmetry is reproduced
  deliberately and is switchable via ``score_normalized=True``;
* unknown user -> popularity fallback (first-k catalog order with
  fabricated scores ``1 - 0.05*i``, ``app/recommendation_service.py:94-102``).
"""

from __future__ import annotations

import json
import logging
import os
import threading
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.config import RecsysConfig
from recsys_tpu.models.towers import TwoTower

# single-dispatch user tower for the device backend's per-request path
# (ModelConfig is a frozen dataclass -> hashable static arg)
_user_embed_jit = jax.jit(TwoTower.user_embed,
                          static_argnames=("cfg", "train"))
from recsys_tpu.retrieval.scorer import RetrievalIndex
from recsys_tpu.train.checkpoint import load_encoder_params

logger = logging.getLogger(__name__)


class _FastRerank:
    """Precomputed host rerank: serves the DCN CTR logit for [Q, C]
    candidate sets in one gather-plus-one-matmul pass instead of a full
    per-pair model forward (the round-2 VERDICT's 271-QPS bottleneck).

    Three observations make the collapse exact:

    1. **Towers are per-entity**: user/item tower outputs depend only on
       the id, so the whole catalog's (and user vocab's) tower outputs
       are materialized once at load.
    2. **The rank-1 cross stack is separable**: with
       ``x_{l+1} = x0 (x_l . w_l) + b_l + x_l`` and per-row input x0,
       induction gives ``x_l = x0 * alpha_l + beta_l`` with a per-row
       SCALAR alpha (``alpha_{l+1} = alpha_l (x0.w_l + 1) + beta_l.w_l``)
       and a constant vector beta (``beta_{l+1} = beta_l + b_l``). Every
       ``x0 . w`` splits into user/item/feature blocks, each of which is
       a per-entity precomputable dot — so the cross stack (and its
       slice of the CTR head) costs a few [Q*C] vector ops and NO
       [Q*C, F] materialization.
    3. **Engineered features are additive-separable** except two
       genuinely pairwise columns: at a fixed serving timestamp
       (t_ref), every other column is user-only, item-only, or
       constant, so ``f(u, i) = FU[u] + FI[i] - f0`` column-wise —
       probed EMPIRICALLY at build time (one transform sweep per
       entity axis) rather than by hand-listing columns, and verified
       against the exact path on random pairs before activation
       (build() returns None on mismatch, falling back to the slow
       path, so feature changes can never silently skew serving).

    The only per-request matmuls left are the pairwise-feature strips
    ([Q*C, 2] x [2, H]) and the deep MLP beyond its first layer
    (first-layer item/user partials are precomputed too).
    """

    PAIR_COLS = ("log_pop_match", "user_genre_match")

    def __init__(self):
        self.ok = False

    # ---- build -------------------------------------------------------
    @classmethod
    def build(cls, params, cfg, engineer, n_users: int, n_items: int,
              tower_np, exact_fn) -> Optional["_FastRerank"]:
        self = cls()
        try:
            self._precompute(params, cfg, engineer, n_users, n_items,
                             tower_np)
        except Exception:  # pragma: no cover - belt and braces
            logger.exception("fast-rerank precompute failed; "
                             "serving the exact per-pair path")
            return None
        # activation gate: exact equality (to tolerance) with the
        # reference path on random pairs — BOTH heads (``exact_fn``
        # returns [N, 2] of (ctr, rating)) — or we refuse to serve it
        rng = np.random.default_rng(0)
        q = min(64, n_users)
        uids = rng.integers(0, n_users, q)
        cands = rng.integers(0, n_items, (q, 3))
        fast = np.stack(self.logits(uids, cands), axis=-1)  # [q, 3, 2]
        exact = np.asarray(
            exact_fn(np.repeat(uids, 3), cands.reshape(-1))
        ).reshape(q, 3, -1)
        if exact.shape[-1] == 1:  # ctr-only exact fn (legacy/tests)
            fast = fast[..., :1]
        if not np.allclose(fast, exact, rtol=1e-3, atol=1e-4):
            logger.warning(
                "fast-rerank self-check failed (max |diff| %.3g): a "
                "feature column is not user/item-separable or the DCN "
                "shape changed; serving the exact per-pair path",
                float(np.max(np.abs(fast - exact))),
            )
            return None
        self.ok = True
        return self

    def _precompute(self, params, cfg, engineer, n_users, n_items,
                    tower_np) -> None:
        D = cfg.embedding_dim
        tw = params["towers"]
        all_items = np.arange(n_items)
        all_users = np.arange(n_users)
        V = tower_np(tw, "item_table", "item_tower", all_items)
        UT = tower_np(tw, "user_table", "user_tower", all_users)

        # ---- feature separation (empirical probe) --------------------
        self.n_feat = 0
        self.pair_idx: List[int] = []
        FU0 = FI0 = f00 = None
        if cfg.dense_features > 0:
            eng = engineer
            t = np.full(max(n_users, n_items), eng.t_ref)
            names = eng.feature_names()
            self.n_feat = len(names)
            FU = eng.transform_scaled(
                all_users, np.zeros(n_users, np.int64), t[:n_users])
            FI = eng.transform_scaled(
                np.zeros(n_items, np.int64), all_items, t[:n_items])
            f0 = eng.transform_scaled(
                np.zeros(1, np.int64), np.zeros(1, np.int64),
                np.full(1, eng.t_ref))[0]
            self.pair_idx = [names.index(c) for c in self.PAIR_COLS
                             if c in names]
            FU0, FI0, f00 = FU.copy(), FI.copy(), f0.copy()
            for j in self.pair_idx:
                FU0[:, j] = 0.0
                FI0[:, j] = 0.0
                f00[j] = 0.0
            # pairwise raw ingredients + their per-column scaling
            self.lu = np.log1p(np.asarray(eng.u_cnt, np.float64))
            self.li = np.log1p(np.asarray(eng.i_cnt, np.float64))
            self.genre_prefs = eng.user_genre_prefs
            self.item_genres = eng.item_genres
            if eng.standardize and hasattr(eng, "scaler"):
                self.pair_mean = np.array(
                    [eng.scaler.mean_[j] for j in self.pair_idx])
                self.pair_scale = np.array(
                    [eng.scaler.scale_[j] for j in self.pair_idx])
            else:
                self.pair_mean = np.zeros(len(self.pair_idx))
                self.pair_scale = np.ones(len(self.pair_idx))
            self.clip_std = getattr(eng, "clip_std", 0.0)
            self.pair_names = [names[j] for j in self.pair_idx]
        F_in = 2 * D + self.n_feat

        def split_w(w):
            """[F_in, ...] -> (user, item, feat) row blocks."""
            return w[:D], w[D:2 * D], w[2 * D:]

        def entity_dots(w):
            """Per-entity dots of x0's blocks with a weight [F_in] or
            [F_in, H]: returns (user_part [n_users,...],
            item_part [n_items,...], const_part, pair_rows)."""
            wu, wv, wf = split_w(np.asarray(w, np.float32))
            u_part = UT @ wu
            i_part = V @ wv
            c_part = 0.0
            pair_rows = None
            if self.n_feat:
                u_part = u_part + FU0 @ wf
                i_part = i_part + FI0 @ wf
                c_part = -(f00 @ wf)
                pair_rows = wf[self.pair_idx]
            return u_part, i_part, c_part, pair_rows

        # ---- cross stack ---------------------------------------------
        dcn = params["dcn"]
        self.cross = []
        beta = np.zeros(F_in, np.float32)
        for i in range(cfg.cross_layers):
            layer = dcn["cross"][f"layer_{i}"]
            w = np.asarray(layer["w"], np.float32)
            self.cross.append({
                "dots": entity_dots(w),
                "beta_dot_w": float(beta @ w),
            })
            beta = beta + np.asarray(layer["b"], np.float32)
        self.beta_L = beta

        # ---- heads (cross slice separable, deep slice direct) ---------
        # Both task heads read the same DCN trunk feature
        # (``multitask.py::MultiTaskModel.apply``: rating and ctr are
        # parallel dense layers on ``h``), so the rating head costs only
        # a second set of per-entity dots on the SAME alpha/deep trunk —
        # this is what lets serving use the trained rating head at all
        # (rerank_weight_sweep.json: +2.1% recall@10 over ctr-only).
        def head_pre(name: str) -> dict:
            w = np.asarray(params[name]["w"], np.float32)[:, 0]
            return {
                "b": float(np.asarray(params[name]["b"])[0]),
                "cross_dots": entity_dots(w[:F_in]),
                "beta_dot": float(beta @ w[:F_in]),
                "deep": w[F_in:],
            }

        self.heads = (head_pre("ctr_head"), head_pre("rating_head"))

        # ---- deep MLP: first layer precomputed per entity -------------
        deep = dcn["deep"]
        self.deep_rest: List[tuple] = []
        self.Q1 = self.P1 = None
        if deep:
            w1 = np.asarray(deep["layer_0"]["w"], np.float32)
            b1 = np.asarray(deep["layer_0"]["b"], np.float32)
            u1, i1, c1, pair1 = entity_dots(w1)
            self.Q1, self.P1 = u1, i1
            self.c1 = b1 + c1
            self.pair1 = pair1
            for i in range(1, len(deep)):
                layer = deep[f"layer_{i}"]
                self.deep_rest.append((
                    np.asarray(layer["w"], np.float32),
                    np.asarray(layer["b"], np.float32),
                ))

    # ---- per-request -------------------------------------------------
    def _pair_cols(self, urep: np.ndarray, flat: np.ndarray) -> np.ndarray:
        """[Q*C, P] scaled+clipped pairwise feature columns."""
        cols = []
        for name in self.pair_names:
            if name == "log_pop_match":
                cols.append(np.abs(self.lu[urep] - self.li[flat]))
            else:  # user_genre_match
                cols.append(np.einsum(
                    "ng,ng->n", self.genre_prefs[urep],
                    self.item_genres[flat]))
        p = np.stack(cols, axis=1).astype(np.float64)
        p = (p - self.pair_mean) / self.pair_scale
        if self.clip_std:
            p = np.clip(p, -self.clip_std, self.clip_std)
        return p.astype(np.float32)

    def logits(self, uids: np.ndarray, cands: np.ndarray,
               need_rating: bool = True) -> tuple:
        """uids [Q], cands [Q, C] -> (ctr_logits, rating_preds), each
        [Q, C], from ONE shared trunk pass (pair columns, cross scalar
        recurrence, deep MLP) — the second head adds only gathers and
        one [Q*C] x [H] matvec, and is skipped entirely
        (rating_preds=None) when ``need_rating`` is False (ctr-only
        deployments shouldn't pay for a discarded head)."""
        q, c = cands.shape
        flat = cands.reshape(-1)
        urep = np.repeat(np.asarray(uids), c)
        pair = self._pair_cols(urep, flat) if self.pair_idx else None

        def dot_x0(dots):
            u_part, i_part, c_part, pair_rows = dots
            s = u_part[urep] + i_part[flat] + c_part
            if pair is not None and pair_rows is not None:
                s = s + pair @ pair_rows
            return s

        # cross stack as scalar recurrence
        alpha = np.ones(q * c, np.float32)
        for layer in self.cross:
            s0 = dot_x0(layer["dots"])
            alpha = alpha * (s0 + 1.0) + layer["beta_dot_w"]

        h = None
        if self.P1 is not None:
            h = self.Q1[urep] + self.P1[flat] + self.c1
            if pair is not None and self.pair1 is not None:
                h = h + pair @ self.pair1
            h = np.maximum(h, 0.0)
            for w, b in self.deep_rest:
                h = np.maximum(h @ w + b, 0.0)

        outs = []
        heads = self.heads if need_rating else self.heads[:1]
        for hd in heads:
            logit = alpha * dot_x0(hd["cross_dots"]) + hd["beta_dot"]
            if h is not None:
                logit = logit + h @ hd["deep"]
            outs.append((logit + hd["b"]).reshape(q, c))
        if not need_rating:
            outs.append(None)
        return tuple(outs)

    def ctr_logits(self, uids: np.ndarray, cands: np.ndarray) -> np.ndarray:
        """uids [Q], cands [Q, C] -> CTR logits [Q, C]."""
        return self.logits(uids, cands, need_rating=False)[0]


class RecommendationService:
    """``backend``: "device" (jitted on-device scorer — the TPU path),
    "sharded" (catalog row-sharded over the ``model`` axis of a device
    mesh, per-shard top-k + cross-shard merge — the multi-chip path for
    catalogs larger than one chip's HBM), "native" (C++ multithreaded
    exact top-k, the CPU-host fallback in the FAISS role), "exported"
    (the AOT ``jax.export`` StableHLO artifact from
    ``serve/export.py`` — the whole retrieve path runs as one
    pre-compiled program, no retracing at startup), or "auto"
    (native when no accelerator is present).

    ``mesh_ctx``: the mesh for the sharded backend; defaults to all
    devices on the ``model`` axis.
    ``exported_path``: artifact for the exported backend; defaults to
    ``<model_dir>/retrieve.hlo``."""

    def __init__(self, model_dir: str, backend: str = "auto",
                 approx_search_threshold: int = 1_000_000,
                 rerank_candidates: int = 0,
                 rerank_ctr_weight: float = 0.25,
                 rerank_rating_weight: float = 0.0,
                 mesh_ctx=None,
                 int8_catalog: bool = False,
                 exported_path: Optional[str] = None):
        if backend not in ("auto", "device", "native", "sharded", "exported"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.mesh_ctx = mesh_ctx
        self.exported_path = exported_path
        # int8-quantized catalog: 4x less HBM (device backend adds an
        # exact f32 refine of the candidate set; effectively lossless on
        # trained embeddings — top-10 agreement 0.9953 raw / 1.0 refined)
        self.int8_catalog = int8_catalog
        # device backend: catalogs larger than this stream blocks with
        # the hardware approx_max_k (recall@10 0.999 vs exact measured
        # at 8M items / dim 128). 0 disables approx entirely.
        self.approx_search_threshold = approx_search_threshold
        # two-stage serving: retrieve this many candidates, rerank by
        # retrieval score + rerank_ctr_weight * DCN CTR logit (the
        # offline-validated combination: +32% recall@10 over retrieval
        # alone, benchmarks/run_quality.py::two_stage_eval). 0 = the
        # reference's retrieval-only contract. Needs model.npz in the
        # bundle (full params).
        self.rerank_candidates = rerank_candidates
        self.rerank_ctr_weight = rerank_ctr_weight
        # trained rating head as a third rerank signal. The measured
        # winner on the c3d bundle is (ctr=0.1, rating=0.25): +2.1%
        # recall@10 over the ctr-only baseline
        # (benchmarks/results/rerank_weight_sweep.json) — at ctr=0.25
        # the rating head HURTS, so the two weights must be set as a
        # pair (scripts/serve.py --rerank_rating_weight). Default 0.0
        # keeps existing deployments' ctr-only behavior. The reference
        # never serves its rating head at all
        # (/root/reference/src/models.py:119).
        self.rerank_rating_weight = rerank_rating_weight
        self.model_params = None
        self.feature_engineer = None
        self._fast_rerank: Optional[_FastRerank] = None
        self.model_dir = model_dir
        self.config: Optional[RecsysConfig] = None
        self.encoder_params = None
        self._encoder_dev = None  # device-resident copy (device backend)
        self.index: Optional[RetrievalIndex] = None
        self.user_id_map: Dict[int, int] = {}
        self.item_id_map: Dict[int, int] = {}
        self._ready = False
        self._lock = threading.Lock()
        self.model_version = "1.0.0"

    # ---- lifecycle -------------------------------------------------
    def load(self) -> "RecommendationService":
        d = self.model_dir
        self.config = RecsysConfig.load(os.path.join(d, "config.json"))
        with open(os.path.join(d, "vocabs.json")) as f:
            vocabs = json.load(f)
        self.user_id_map = {int(u): i for i, u in enumerate(vocabs["users"])}
        self.item_id_map = {int(m): i for i, m in enumerate(vocabs["items"])}
        self.encoder_params = load_encoder_params(d)
        if self.rerank_candidates > 0:
            from recsys_tpu.train.checkpoint import (
                load_feature_engineer, load_model_params,
            )

            self.model_params = load_model_params(d)
            if self.model_params is None:
                logger.warning(
                    "rerank requested but %s has no model.npz; "
                    "serving retrieval-only", d,
                )
            # fitted FeatureEngineer (present iff the model trains on
            # engineered dense features): rerank computes the identical
            # training-time features, with "now" = end of train
            self.feature_engineer = load_feature_engineer(d)
            if (self.model_params is not None
                    and self.config.model.dense_features > 0
                    and self.feature_engineer is None):
                logger.warning(
                    "model consumes dense features but %s has no "
                    "features.npz; serving retrieval-only", d,
                )
                self.model_params = None
            if self.model_params is not None:
                # precomputed rerank (towers materialized, separable
                # cross, additive feature split) — self-checked against
                # the exact path at build; None = fall back to exact
                self._fast_rerank = _FastRerank.build(
                    self.model_params, self.config.model,
                    self.feature_engineer,
                    len(self.user_id_map), len(self.item_id_map),
                    self._tower_np, self._heads_exact_for_check,
                )
                if self._fast_rerank is not None:
                    logger.info("fast rerank active (precomputed towers "
                                "+ separable cross + feature split)")
        self.index = RetrievalIndex.load(os.path.join(d, "index.npz"))
        if self.backend == "sharded":
            if self.mesh_ctx is None:
                import jax

                from recsys_tpu.parallel.mesh import make_mesh

                self.mesh_ctx = make_mesh(
                    model_parallel=len(jax.devices()), data_parallel=1
                )
            self._sharded = self.index.shard(
                self.mesh_ctx, int8=self.int8_catalog
            )
        if self.backend == "exported":
            from recsys_tpu.serve.export import bundle_fingerprint, load_exported

            path = self.exported_path or os.path.join(d, "retrieve.hlo")
            with open(path + ".json") as f:
                meta = json.load(f)
            self._exported_k = int(meta["k"])
            # coherence gate: the artifact bakes in weights + catalog as
            # constants, while recommend() maps its returned row indices
            # through THIS bundle's index.npz and reranks with THIS
            # bundle's model.npz. A stale artifact over a retrained
            # bundle silently serves old weights — or wrong item ids if
            # the catalog order changed — so fail loudly instead.
            current = bundle_fingerprint(d)
            stamped = meta.get("source_fingerprint")
            if stamped != current:
                raise ValueError(
                    f"exported artifact {path} was built from a different "
                    f"bundle than {d} (stamped fingerprint "
                    f"{stamped!r}, current {current[:16]}...): the bundle "
                    "was retrained or rebuilt after export — re-run "
                    "scripts/export.py to refresh retrieve.hlo"
                )
            self._exported_fn = load_exported(path)
            if self.rerank_candidates > self._exported_k:
                raise ValueError(
                    f"rerank_candidates={self.rerank_candidates} exceeds "
                    f"the artifact's exported top-k ({self._exported_k}); "
                    f"re-export with a larger --k"
                )
        self._popular = [int(r) for r in self.index.item_raw_ids[:200]]
        self._ready = True
        logger.info(
            "loaded model from %s (%d users, %d items)",
            d, len(self.user_id_map), len(self.item_id_map),
        )
        return self

    def is_ready(self) -> bool:
        return self._ready

    def _resolved_backend(self) -> str:
        """auto -> native when the C++ library is available: a single
        request is one tiny MLP + one catalog dot — host compute wins
        whenever accelerator dispatch costs more than ~1 ms (always true
        over a remote-TPU tunnel; on a locally-attached TPU choose
        backend="device" explicitly for large-batch throughput)."""
        if self.backend != "auto":
            return self.backend
        from recsys_tpu.utils.native import native_available

        return "native" if native_available() else "device"

    def _search(self, u_emb, k: int):
        """Cosine top-k via the resolved backend."""
        if self._resolved_backend() == "sharded":
            return self._sharded.search(u_emb, k)
        if self._resolved_backend() == "native":
            if not hasattr(self, "_items_norm"):
                items = self.index.item_embeddings_np
                norms = np.maximum(
                    np.linalg.norm(items, axis=-1, keepdims=True), 1e-12
                )
                self._items_norm = items / norms
            q = np.asarray(u_emb, np.float32)
            q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            # one BLAS matmul + argpartition at EVERY query count: at
            # 3883 x 128 it beats the C++ heap scan ~10x even for a
            # single query (0.04 vs 0.53 ms measured on this host; the
            # C++ path in utils.native remains the no-BLAS fallback)
            scores = q @ self._items_norm.T
            part = np.argpartition(-scores, min(k, scores.shape[1] - 1), axis=1)[:, :k]
            ps = np.take_along_axis(scores, part, axis=1)
            order = np.argsort(-ps, axis=1)
            idx = np.take_along_axis(part, order, axis=1)
            return np.take_along_axis(scores, idx, axis=1), idx
        # device backend: past the threshold the dense [Q, N] scorer
        # stops fitting comfortably; stream blocks with the hardware
        # approx_max_k (26.7x at 8M items, recall@10 0.999 vs exact)
        if self.int8_catalog:
            return self.index.search(u_emb, k, int8=True, approx=True,
                                     refine_factor=4)
        n_index_rows = self.index.item_embeddings_np.shape[0]
        if (self.approx_search_threshold
                and n_index_rows > self.approx_search_threshold):
            return self.index.search(u_emb, k, approx=True)
        return self.index.search(u_emb, k)

    def _retrieve(self, dense_ids, k: int):
        """dense user ids -> (scores[Q,k], catalog row idx[Q,k]).
        The exported backend runs the whole path (tower -> normalize ->
        matmul -> top-k) inside one pre-compiled StableHLO program; the
        others go embed-then-search."""
        ids = np.atleast_1d(np.asarray(dense_ids))
        if self._resolved_backend() == "exported":
            if k > self._exported_k:
                raise ValueError(
                    f"k={k} exceeds the artifact's exported top-k "
                    f"({self._exported_k}); re-export with a larger --k"
                )
            scores, idx = self._exported_fn(ids)
            return scores[:, :k], idx[:, :k]
        return self._search(self._user_embedding(ids), k)

    def _rerank_active(self) -> bool:
        return self.rerank_candidates > 0 and self.model_params is not None

    def _ctr_exact_for_check(self, flat_u: np.ndarray,
                             flat_i: np.ndarray) -> np.ndarray:
        """Exact per-pair CTR logits (features + full model forward) —
        the reference path _FastRerank self-checks against at build."""
        return self._heads_exact_for_check(flat_u, flat_i)[:, 0]

    def _heads_exact_for_check(self, flat_u: np.ndarray,
                               flat_i: np.ndarray) -> np.ndarray:
        """Exact per-pair (ctr, rating) [N, 2] — _FastRerank's build
        gate checks BOTH heads since the rating head serves too."""
        dense = None
        if self.config.model.dense_features > 0:
            eng = self.feature_engineer
            now = np.full(len(flat_u), eng.t_ref)
            dense = eng.transform_scaled(flat_u, flat_i, now)
        feat = self._trunk_np(flat_u, flat_i, dense)
        return np.stack([self._head_np(feat, "ctr_head"),
                         self._head_np(feat, "rating_head")], axis=-1)

    def _rerank(self, dense_uids, scores, idx, k: int):
        """Two-stage rerank: [Q, C] candidates -> top-[Q, k] by
        retrieval score + ctr_weight * CTR logit
        [+ rating_weight * rating pred] (same combination as the
        offline two-stage eval / rerank_weight_sweep.json)."""
        idx = np.asarray(idx)
        q, c = idx.shape
        w_r = self.rerank_rating_weight
        if (self._fast_rerank is not None
                and self._resolved_backend() != "device"):
            # precomputed host path: gathers + one small matmul
            ctr, rating = self._fast_rerank.logits(
                np.asarray(dense_uids), idx, need_rating=bool(w_r))
        else:
            flat_u = np.repeat(np.asarray(dense_uids), c)
            flat_i = idx.reshape(-1)
            dense = None
            if self.config.model.dense_features > 0:
                eng = self.feature_engineer
                now = np.full(len(flat_u), eng.t_ref)
                dense = eng.transform_scaled(flat_u, flat_i, now)
            if self._resolved_backend() == "native":
                # host path: no per-request accelerator dispatch
                feat = self._trunk_np(flat_u, flat_i, dense)
                ctr = self._head_np(feat, "ctr_head").reshape(q, c)
                rating = (self._head_np(feat, "rating_head").reshape(q, c)
                          if w_r else 0.0)
            else:
                from recsys_tpu.models.multitask import MultiTaskModel

                out = MultiTaskModel.apply(
                    self.model_params, self.config.model,
                    jnp.asarray(flat_u), jnp.asarray(flat_i),
                    dense=None if dense is None else jnp.asarray(dense),
                )
                ctr = np.asarray(out.ctr_logit).reshape(q, c)
                rating = (np.asarray(out.rating_pred).reshape(q, c)
                          if w_r else 0.0)
        combined = np.asarray(scores) + self.rerank_ctr_weight * ctr
        if w_r:
            combined = combined + w_r * rating
        order = np.argsort(-combined, axis=1)[:, :k]
        return (
            np.take_along_axis(combined, order, axis=1),
            np.take_along_axis(idx, order, axis=1),
        )

    # ---- core ops --------------------------------------------------
    def _user_embedding(self, dense_uid) -> jnp.ndarray:
        ids = np.atleast_1d(np.asarray(dense_uid))
        if self._resolved_backend() == "native":
            return self._user_embedding_np(ids)
        # device backend: params live on device ONCE and the tower is
        # one jitted dispatch. The eager alternative re-transferred the
        # host-resident user table ([100k, 128] = 51 MB) on EVERY
        # request — ~1.1 s/query over the bench host's tunnel, the
        # dominant term serve_large_bench caught at 1M items.
        if self._encoder_dev is None:
            self._encoder_dev = jax.device_put(self.encoder_params)
        return _user_embed_jit(
            self._encoder_dev, jnp.asarray(ids), self.config.model
        )

    def _tower_np(self, params, table_key: str, tower_key: str,
                  ids: np.ndarray) -> np.ndarray:
        """Pure-NumPy tower forward (inference mode) — parity with
        ``TwoTower._tower`` is tested in test_serving.py."""
        table = np.asarray(params[table_key])
        rows = table[np.clip(ids, 0, table.shape[0] - 1)]
        h = rows.astype(np.float32)
        tower = params[tower_key]
        n = len(tower)
        for i in range(n):
            layer = tower[f"layer_{i}"]
            h = h @ np.asarray(layer["w"]) + np.asarray(layer["b"])
            if i < n - 1:
                h = np.maximum(h, 0.0)
        if self.config.model.tower_residual:
            h = h + rows
        return h

    def _user_embedding_np(self, ids: np.ndarray) -> np.ndarray:
        """Pure-NumPy user tower for the host serving path — a single
        tiny MLP per request; avoids per-request accelerator dispatch
        (which costs ~100 ms RPC over a remote-TPU tunnel)."""
        return self._tower_np(self.encoder_params, "user_table",
                              "user_tower", ids)

    def _trunk_np(self, user_ids: np.ndarray, item_ids: np.ndarray,
                  dense: Optional[np.ndarray] = None) -> np.ndarray:
        """Pure-NumPy DCN trunk feature (towers -> cross + deep concat,
        inference mode) shared by both task heads — parity with
        ``MultiTaskModel.apply`` is tested in test_serving.py."""
        p = self.model_params
        tw = p["towers"]
        u = self._tower_np(tw, "user_table", "user_tower", user_ids)
        v = self._tower_np(tw, "item_table", "item_tower", item_ids)
        parts = [u, v] if dense is None else [u, v, dense]
        x0 = np.concatenate(parts, axis=-1).astype(np.float32)
        xl = x0
        cfg = self.config.model
        for i in range(cfg.cross_layers):
            layer = p["dcn"]["cross"][f"layer_{i}"]
            xw = (xl @ np.asarray(layer["w"]))[:, None]
            xl = x0 * xw + np.asarray(layer["b"]) + xl
        if p["dcn"]["deep"]:
            h = x0
            deep = p["dcn"]["deep"]
            for i in range(len(deep)):
                layer = deep[f"layer_{i}"]
                h = np.maximum(
                    h @ np.asarray(layer["w"]) + np.asarray(layer["b"]), 0.0
                )
            return np.concatenate([xl, h], axis=-1)
        return xl

    def _head_np(self, feat: np.ndarray, name: str) -> np.ndarray:
        head = self.model_params[name]
        return (feat @ np.asarray(head["w"]) + np.asarray(head["b"]))[:, 0]

    def _ctr_logits_np(self, user_ids: np.ndarray,
                       item_ids: np.ndarray,
                       dense: Optional[np.ndarray] = None) -> np.ndarray:
        return self._head_np(self._trunk_np(user_ids, item_ids, dense),
                             "ctr_head")

    def recommend(self, user_id: int, k: int = 10) -> List[Dict]:
        """Top-k for one user; cosine scores; popularity fallback for
        unknown users (``app/recommendation_service.py:64-81``)."""
        if not self._ready:
            raise RuntimeError("service not loaded")
        dense = self.user_id_map.get(int(user_id))
        if dense is None:
            return self._popular_items(k)
        if self._rerank_active():
            c = max(self.rerank_candidates, k)
            scores, ids = self._retrieve([dense], c)
            scores, ids = self._rerank([dense], scores, ids, k)
        else:
            scores, ids = self._retrieve([dense], k)
        return [
            {
                "item_id": int(self.index.item_raw_ids[i]),
                "score": float(s),
                "rank": r + 1,
            }
            for r, (i, s) in enumerate(zip(ids[0], scores[0]))
        ]

    def recommend_batch(self, user_ids: List[int], k: int = 10) -> List[Dict]:
        """Batch variant — documented + smoke-tested by the reference
        but missing from its shipped app (``app/model_service.py:200-228``);
        shipped here. One jitted scoring call for the whole batch."""
        if not self._ready:
            raise RuntimeError("service not loaded")
        dense = [self.user_id_map.get(int(u)) for u in user_ids]
        known = [i for i, d in enumerate(dense) if d is not None]
        out: List[Dict] = [
            {"user_id": int(u), "recommendations": self._popular_items(k),
             "status": "cold_start"}
            for u in user_ids
        ]
        if known:
            known_dense = np.array([dense[i] for i in known])
            if self._rerank_active():
                c = max(self.rerank_candidates, k)
                scores, top = self._retrieve(known_dense, c)
                scores, top = self._rerank(known_dense, scores, top, k)
            else:
                scores, top = self._retrieve(known_dense, k)
            for row, i in enumerate(known):
                out[i] = {
                    "user_id": int(user_ids[i]),
                    "recommendations": [
                        {
                            "item_id": int(self.index.item_raw_ids[j]),
                            "score": float(s),
                            "rank": r + 1,
                        }
                        for r, (j, s) in enumerate(zip(top[row], scores[row]))
                    ],
                    "status": "ok",
                }
        return out

    def score(self, user_id: int, item_ids: List[int],
              normalized: bool = False) -> List[Dict]:
        """Score given items for a user. Default raw dot (reference
        ``/score`` parity); ``normalized=True`` gives cosine."""
        if not self._ready:
            raise RuntimeError("service not loaded")
        dense_u = self.user_id_map.get(int(user_id))
        if dense_u is None:
            raise ValueError(f"unknown user_id {user_id}")
        dense_items = []
        for m in item_ids:
            d = self.item_id_map.get(int(m))
            if d is None:
                raise ValueError(f"unknown item_id {m}")
            dense_items.append(d)
        u = np.asarray(self._user_embedding(dense_u))
        if not hasattr(self, "_items_host"):
            self._items_host = self.index.item_embeddings_np
        sel = self._items_host[np.array(dense_items)]
        if normalized:
            un = u / np.maximum(np.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
            sn = sel / np.maximum(np.linalg.norm(sel, axis=-1, keepdims=True), 1e-12)
            s = (un @ sn.T)[0]
        else:
            s = (u @ sel.T)[0]
        return [
            {"item_id": int(m), "score": float(v)} for m, v in zip(item_ids, s)
        ]

    def _popular_items(self, k: int) -> List[Dict]:
        """Cold-start fallback, fabricated scores 1 - 0.05*i
        (``app/recommendation_service.py:94-102`` parity)."""
        return [
            {"item_id": int(m), "score": round(1.0 - 0.05 * i, 4), "rank": i + 1}
            for i, m in enumerate(self._popular[:k])
        ]

    def get_model_info(self) -> Dict:
        # bundle_mtime identifies WHICH artifacts are live (the encoder
        # file's mtime) — it changes on retrain, so /admin/reload and
        # operators can tell a hot-swapped bundle from the old one even
        # when config.json's model_version string is unchanged
        enc = os.path.join(self.model_dir, "encoder.npz")
        mtime = os.path.getmtime(enc) if os.path.exists(enc) else None
        return {
            "model_version": self.model_version,
            "model_dir": self.model_dir,
            "bundle_mtime": mtime,
            "n_users": len(self.user_id_map),
            "n_items": len(self.item_id_map),
            "embedding_dim": self.config.model.embedding_dim if self.config else None,
            "backend": f"recsys_tpu {self._resolved_backend()} scorer",
            "ready": self._ready,
        }


class StubRecommendationService(RecommendationService):
    """Degraded-mode stand-in: no trained artifacts needed; random
    seeded embeddings (``app/simple_model_loader.py`` parity). Useful to
    exercise the API without training."""

    def __init__(self, n_users: int = 100, n_items: int = 200, dim: int = 16,
                 seed: int = 42):
        super().__init__(model_dir="<stub>")
        rng = np.random.default_rng(seed)
        from recsys_tpu.config import ModelConfig

        self.config = RecsysConfig(model=ModelConfig(embedding_dim=dim))
        self.user_id_map = {i + 1: i for i in range(n_users)}
        self.item_id_map = {i + 1: i for i in range(n_items)}
        self._stub_user_embs = rng.normal(size=(n_users, dim)).astype(np.float32)
        self.index = RetrievalIndex(
            rng.normal(size=(n_items, dim)).astype(np.float32),
            np.arange(1, n_items + 1),
        )
        self._popular = [int(r) for r in self.index.item_raw_ids[:200]]
        self._ready = True
        self.model_version = "stub-0.0.0"

    def _user_embedding(self, dense_uid) -> np.ndarray:
        ids = np.atleast_1d(np.asarray(dense_uid))
        return self._stub_user_embs[ids]

    def score(self, user_id: int, item_ids: List[int],
              normalized: bool = False) -> List[Dict]:
        return super().score(user_id, item_ids, normalized)
