"""Jit-compiled SPMD trainer (the ``ProductionTrainer`` replacement).

Capability parity with ``src/trainer.py:37-193`` redesigned TPU-first:

* one compiled train step (fwd + bwd + optimizer) under ``jit`` with
  ``NamedSharding``-annotated state — XLA inserts the DP gradient
  all-reduce over ICI (replacing MirroredStrategy/NCCL,
  ``src/trainer.py:45-48``); donated state for in-place updates,
* embedding tables optionally row-sharded over the ``model`` axis
  (``MeshConfig.embedding_sharding="rows"``) — slot variables inherit
  the table sharding automatically,
* balanced CTR class weights (``src/trainer.py:139-146``),
* Adagrad + staircase exponential decay + global-norm clip
  (``src/trainer.py:157-163``) from ``train.optimizer``,
* early stopping on val loss with best-weight restore + best checkpoint
  (EarlyStopping/ModelCheckpoint parity, ``src/trainer.py:165-174``),
* per-epoch metric sinks (``training_log.csv``, ``detailed_metrics.json``),
  final ``metrics.json``/``config.json`` via ``utils.metrics_io``,
* full-metric offline eval per epoch (wired in, unlike the reference's
  unused ``AdvancedMetrics`` — SURVEY §0.3),
* checkpoint/resume (absent upstream), inference-bundle export.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from recsys_tpu.config import RecsysConfig
from recsys_tpu.data.negative_sampling import NegativeSampler
from recsys_tpu.data.pipeline import Batcher
from recsys_tpu.models import losses
from recsys_tpu.models.multitask import MultiTaskModel
from recsys_tpu.parallel.mesh import MeshContext, make_mesh
from recsys_tpu.parallel.sharding import shard_batch, shard_batch_chunk
from recsys_tpu.retrieval.evaluator import evaluate
from recsys_tpu.retrieval.scorer import RetrievalIndex
from recsys_tpu.train import checkpoint as ckpt_lib
from recsys_tpu.train.optimizer import make_optimizer
from recsys_tpu.utils.metrics_io import MetricWriter

logger = logging.getLogger(__name__)


def _prefetch(iterator, place, depth: int = 2):
    """Device-prefetching iterator: keeps ``depth`` batches in flight so
    host->device transfer overlaps the compiled step (the tf.data
    ``prefetch(AUTOTUNE)`` analogue, ``src/trainer.py:117``)."""
    import collections

    buf = collections.deque()
    for item in iterator:
        buf.append(place(item))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array
    # auxiliary carried state; today: the CBNS cross-batch negative
    # cache ({"emb" [N, D], "ids" [N], "corr" [N]} FIFO) when
    # TrainConfig.negative_cache > 0, else None (absent from the tree)
    extras: Any = None


def _dropout_key(impl: str, base: jax.Array, step: jnp.ndarray) -> jax.Array:
    """Per-step dropout key. ``impl="rbg"`` derives a hardware
    RngBitGenerator key from (base, step) — threefry mask generation
    alone costs ~45% of a B=4096 train step on a v5e chip, rbg makes it
    ~free while staying deterministic per (seed, step)."""
    if impl == "rbg":
        data = jnp.stack(
            [
                base[0].astype(jnp.uint32),
                base[1].astype(jnp.uint32),
                step.astype(jnp.uint32),
                jnp.uint32(0x5EED),
            ]
        )
        return jax.random.wrap_key_data(data, impl="rbg")
    return jax.random.fold_in(base, step)


class Trainer:
    def __init__(
        self,
        config: RecsysConfig,
        output_dir: str = "outputs/run",
        mesh_ctx: Optional[MeshContext] = None,
    ):
        self.config = config
        self.output_dir = output_dir
        self.ctx = mesh_ctx or make_mesh(model_parallel=config.mesh.model_axis)
        self.optimizer = make_optimizer(config.train)
        self.writer = MetricWriter(output_dir)
        self.ckpt = ckpt_lib.CheckpointManager(
            f"{output_dir}/checkpoints", keep=config.train.keep_checkpoints,
            async_save=config.train.async_checkpoint,
        )

    # ---- sharding layout -------------------------------------------
    def state_shardings(self, state_shape) -> TrainState:
        """Tables over ``model`` axis when configured; everything else
        replicated. Opt-state slots mirror their parameter."""
        ctx = self.ctx
        rows = self.config.mesh.embedding_sharding == "rows" and ctx.n_model > 1

        def spec_for(path, leaf):
            names = [p.key for p in path if hasattr(p, "key")]
            if rows and names and names[-1] in ("user_table", "item_table"):
                return NamedSharding(ctx.mesh, P(ctx.model_axis, None))
            return NamedSharding(ctx.mesh, P())

        params_sh = jax.tree_util.tree_map_with_path(spec_for, state_shape.params)

        def slot_sharding(slot_tree):
            # opt slots have the same tree structure per slot name
            return jax.tree_util.tree_map_with_path(spec_for, slot_tree)

        opt_sh = {k: slot_sharding(v) for k, v in state_shape.opt_state.items()}
        rep = NamedSharding(ctx.mesh, P())
        extras_sh = jax.tree.map(lambda _: rep, state_shape.extras)
        return TrainState(params_sh, opt_sh, rep, rep, extras_sh)

    def batch_sharding_tree(self, batch: Dict[str, np.ndarray]):
        ctx = self.ctx
        return {
            k: NamedSharding(ctx.mesh, P(ctx.data_axis, *([None] * (np.asarray(v).ndim - 1))))
            for k, v in batch.items()
        }

    # ---- state init -------------------------------------------------
    def init_state(self, n_users: int, n_items: int, seed: int) -> TrainState:
        cfg = self.config

        rows_mult = (
            self.ctx.n_model
            if cfg.mesh.embedding_sharding == "rows" and self.ctx.n_model > 1
            else 1
        )

        def _init(key):
            params = MultiTaskModel.init(key, cfg.model, n_users, n_items, rows_mult)
            opt_state = self.optimizer.init(params)
            extras = None
            if cfg.train.negative_cache > 0:
                n = cfg.train.negative_cache
                extras = {
                    # empty slots: out-of-vocab id (-1 never matches a
                    # real id) + corr -1e9 (exp -> 0 in the softmax)
                    "emb": jnp.zeros((n, cfg.model.embedding_dim),
                                     jnp.float32),
                    "ids": jnp.full((n,), -1, jnp.int32),
                    "corr": jnp.full((n,), -1e9, jnp.float32),
                }
            return TrainState(
                params, opt_state, jnp.zeros((), jnp.int32),
                jax.random.PRNGKey(seed + 1), extras,
            )

        key = jax.random.PRNGKey(seed)
        shape = jax.eval_shape(_init, key)
        shardings = self.state_shardings(shape)
        with self.ctx.mesh:
            state = jax.jit(_init, out_shardings=shardings)(key)
        return state

    # ---- compiled step ----------------------------------------------
    def make_train_step(self, class_weights, example_batch, use_explicit_negs: bool):
        cfg = self.config
        self._check_cache_config(
            int(np.asarray(example_batch["user_id"]).shape[0]))
        shape = jax.eval_shape(lambda s: s, self._state_for_shape)
        state_sh = self.state_shardings(shape)
        batch_sh = self.batch_sharding_tree(example_batch)
        step_fn = self._step_core(class_weights, use_explicit_negs)

        donate = (0,) if cfg.train.donate_state else ()
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, batch_sh),
            out_shardings=(state_sh, NamedSharding(self.ctx.mesh, P())),
            donate_argnums=donate,
        )

    def make_train_chunk(self, class_weights, example_batch,
                         use_explicit_negs: bool, n_steps: int):
        """K-step streaming chunk: ``lax.scan`` the train step over a
        ``[K, B, ...]`` stack of K staged batches in ONE dispatch
        (``TrainConfig.stream_chunk_steps``). Same per-step math as
        ``make_train_step`` in the same batch order — only the
        host<->device cadence changes (one transfer + one dispatch per
        K steps instead of per step). Returns mean metrics over the
        chunk."""
        cfg = self.config
        self._check_cache_config(
            int(np.asarray(example_batch["user_id"]).shape[0]))
        shape = jax.eval_shape(lambda s: s, self._state_for_shape)
        state_sh = self.state_shardings(shape)
        ctx = self.ctx
        chunk_sh = {
            k: NamedSharding(
                ctx.mesh,
                P(None, ctx.data_axis, *([None] * (np.asarray(v).ndim - 1))),
            )
            for k, v in example_batch.items()
        }
        step_fn = self._step_core(class_weights, use_explicit_negs)

        def chunk_fn(state, chunk):
            state, ms = jax.lax.scan(step_fn, state, chunk, length=n_steps)
            return state, jax.tree.map(jnp.mean, ms)

        donate = (0,) if cfg.train.donate_state else ()
        return jax.jit(
            chunk_fn,
            in_shardings=(state_sh, chunk_sh),
            out_shardings=(state_sh, NamedSharding(ctx.mesh, P())),
            donate_argnums=donate,
        )

    # sparse-vs-dense crossover (v5e-measured): below ~32M table
    # elements the dense update's full-table traffic is cheaper than the
    # sparse path's sort/segment/scatter overhead (~0.46 ms at B=4096)
    SPARSE_AUTO_THRESHOLD = 32_000_000

    def _resolve_sparse_updates(self) -> bool:
        stu = self.config.train.sparse_table_updates
        if stu != "auto":
            return bool(stu)
        state = getattr(self, "_state_for_shape", None)
        if state is None:
            return False
        tw = state.params["towers"]
        elems = tw["user_table"].size + tw["item_table"].size
        return elems > self.SPARSE_AUTO_THRESHOLD

    def _use_spmd_step(self) -> bool:
        """The explicit shard_map step is required when (a) row-sharded
        tables must be read through an explicit collective lookup
        (psum/a2a — or xla-with-rows inside any shard_map step, where
        the body sees table SHARDS and a plain gather would be wrong),
        or (b) per-replica in-batch negatives are requested
        (``global_negatives=False``), which the jit/GSPMD path cannot
        express (it always computes the full global [B, B] logits)."""
        cfg = self.config
        ctx = self.ctx
        rows = cfg.mesh.embedding_sharding == "rows" and ctx.n_model > 1
        explicit_lookup = rows and cfg.mesh.lookup_strategy != "xla"
        per_replica = (not cfg.train.global_negatives) and ctx.n_data > 1
        return explicit_lookup or per_replica

    def _step_core(self, class_weights, use_explicit_negs: bool):
        cfg = self.config
        opt = self.optimizer
        # sparse updates: adagrad is bit-exact to the dense step; adam
        # runs with LAZY moment semantics (sparse_lazy_adam_combined)
        sparse_capable = cfg.train.optimizer in ("adagrad", "adam")
        sparse = (
            self._resolve_sparse_updates()
            and sparse_capable
            and not use_explicit_negs
        )
        if sparse and cfg.train.optimizer == "adam":
            # semantics change, not just mechanics — say so, especially
            # when "auto" picked sparse because the tables grew
            logger.info(
                "sparse_table_updates with optimizer=adam uses LAZY-Adam "
                "semantics (untouched rows keep un-decayed moments; "
                "TF-LazyAdam parity) — a deliberate divergence from "
                "dense Adam; set sparse_table_updates=False for exact "
                "dense-Adam math at full-table update cost.")
        if self._use_spmd_step():
            return self._step_core_spmd(
                class_weights, use_explicit_negs, sparse=sparse
            )
        if sparse:
            return self._step_core_sparse(class_weights)

        def step_fn(state: TrainState, batch) -> tuple[TrainState, Dict]:
            rng = _dropout_key(
                cfg.train.dropout_rng_impl, state.rng, state.step
            )
            neg_ids = batch.pop("neg_ids") if use_explicit_negs else None
            (loss, metrics), grads = jax.value_and_grad(
                MultiTaskModel.loss, has_aux=True
            )(
                state.params,
                cfg.model,
                batch,
                key=rng,
                train=True,
                class_weights=class_weights,
                neg_item_ids=neg_ids,
                extra_candidates=self._cache_tuple(state),
            )
            new_cache = self._cache_update(state, state.params, batch)
            new_params, new_opt = opt.update(
                grads, state.opt_state, state.params, state.step
            )
            return TrainState(new_params, new_opt, state.step + 1,
                              state.rng, new_cache), metrics

        return step_fn

    # ---- CBNS cross-batch negative cache (TrainConfig.negative_cache)
    @staticmethod
    def _cache_tuple(state: TrainState):
        """extras -> the (emb, ids, corr) triple the loss consumes."""
        if state.extras is None:
            return None
        c = state.extras
        return (c["emb"], c["ids"], c["corr"])

    def _cache_update(self, state: TrainState, params, batch):
        """FIFO-append this batch's item embeddings (+ their bias-logq
        correction) to the cache — computed from the PRE-update params,
        i.e. the embeddings this step actually scored (CBNS caches
        current-step encodings and lets them go slightly stale)."""
        if state.extras is None:
            return None
        from recsys_tpu.models.towers import TwoTower

        cfg = self.config
        tw = params["towers"]
        ids = batch["movie_id"]
        emb = TwoTower.item_embed(tw, ids, cfg.model, train=False)
        corr = jnp.zeros((ids.shape[0],), jnp.float32)
        if cfg.model.use_item_bias:
            n_bias = tw["item_bias"].shape[0] - 1
            corr = corr + jnp.take(tw["item_bias"],
                                   jnp.clip(ids, 0, n_bias))
        if "log_q" in batch:
            corr = corr - batch["log_q"]
        b = ids.shape[0]
        c = state.extras
        return {
            "emb": jnp.concatenate([c["emb"][b:], emb]),
            "ids": jnp.concatenate([c["ids"][b:], ids]),
            "corr": jnp.concatenate([c["corr"][b:], corr]),
        }

    def _check_cache_config(self, batch_rows: int) -> None:
        n = self.config.train.negative_cache
        if n <= 0:
            return
        if (self._use_spmd_step()
                and not self.config.train.global_negatives
                and self.ctx.n_data > 1):
            # per-replica negative scope deliberately restricts each
            # row's candidates to its own replica's batch; a replicated
            # global cache would silently widen that scope back out
            raise ValueError(
                "negative_cache composes with global_negatives only — "
                "per-replica negative scope contradicts a shared "
                "cross-batch cache")
        if n % batch_rows != 0:
            raise ValueError(
                f"negative_cache ({n}) must be a multiple of the global "
                f"batch size ({batch_rows}) — the FIFO advances one "
                "batch per step")

    _TABLE_KEYS = ("user_table", "item_table", "item_bias")

    def _sparse_apply(self, state: TrainState, grads_virtual,
                      uid, mid, bid) -> tuple[Any, Any]:
        """Shared tail of the sparse-update train steps: take a gradient
        tree whose ``towers.{user_table,item_table,item_bias}`` leaves
        are PER-OCCURRENCE row gradients ([B, D] / [B], aligned with
        ``uid``/``mid``/``bid``) and every other leaf a dense gradient,
        and produce ``(new_params, new_opt)`` with dense-scatter-add
        semantics: duplicates combined, global-norm clipping over dense
        grads + combined rows (identical value to the dense path —
        untouched rows contribute zero), the configured optimizer on
        dense leaves, touched-rows-only updates on the tables:
        adagrad bit-exact to the dense step (no per-step decay on
        untouched slots), adam with LAZY semantics
        (``optimizer.sparse_lazy_adam_combined`` — untouched rows keep
        un-decayed moments, the TF-LazyAdam trade that makes the
        flagship Adam recipe usable on giant tables). Runs under the
        enclosing jit, so sharded tables get partitioned scatters."""
        from recsys_tpu.train import optimizer as opt_lib

        cfg = self.config
        opt_name = cfg.train.optimizer
        sched = opt_lib.make_schedule(cfg.train)
        # the dense leaves (DCN + heads) must honor the ranking-LR split
        # exactly like the dense step's optimizer; the table rows below
        # are retrieval-side and keep the base LR by definition
        noclip = (opt_lib.adagrad if opt_name == "adagrad"
                  else opt_lib.adam)(
            sched, clipnorm=0.0,
            lr_scale_fn=opt_lib.ranking_lr_scale(cfg.train),
        )
        clipnorm = cfg.train.clipnorm
        keys = self._TABLE_KEYS
        params = state.params
        tw = params["towers"]
        gtw = grads_virtual["towers"]
        comb = {
            "user_table": opt_lib.combine_duplicate_rows(
                uid, gtw["user_table"]
            ),
            "item_table": opt_lib.combine_duplicate_rows(
                mid, gtw["item_table"]
            ),
            "item_bias": opt_lib.combine_duplicate_rows(
                bid, gtw["item_bias"]
            ),
        }
        dense_grads = {
            **grads_virtual,
            "towers": {k: v for k, v in gtw.items() if k not in keys},
        }
        if clipnorm > 0:
            sq = sum(
                jnp.sum(jnp.square(g))
                for g in jax.tree.leaves(dense_grads)
            )
            sq += sum(jnp.sum(jnp.square(c[1])) for c in comb.values())
            scale = jnp.minimum(
                1.0, clipnorm / jnp.maximum(jnp.sqrt(sq), 1e-12)
            )
        else:
            scale = jnp.float32(1.0)
        dense_grads = jax.tree.map(lambda g: g * scale, dense_grads)

        dense_params = {
            **params,
            "towers": {k: v for k, v in tw.items() if k not in keys},
        }
        # slot trees ("accum" for adagrad; "mu"/"nu" for adam) mirror
        # the params tree — slice the table leaves out of each
        slots = state.opt_state
        dense_slots = {
            s: {
                **t,
                "towers": {
                    k: v for k, v in t["towers"].items() if k not in keys
                },
            }
            for s, t in slots.items()
        }
        new_dense, new_dense_opt = noclip.update(
            dense_grads, dense_slots, dense_params, state.step,
        )
        lr = sched(state.step)
        new_tw = dict(new_dense["towers"])
        new_slots_tw = {
            s: dict(new_dense_opt[s]["towers"]) for s in new_dense_opt
        }
        for k in keys:
            slot, c, valid = comb[k]
            if opt_name == "adagrad":
                new_tw[k], new_slots_tw["accum"][k] = (
                    opt_lib.sparse_adagrad_combined(
                        tw[k], slots["accum"]["towers"][k], slot, c,
                        valid, lr, grad_scale=scale,
                    )
                )
            else:  # adam -> lazy adam on the touched rows
                (new_tw[k], new_slots_tw["mu"][k],
                 new_slots_tw["nu"][k]) = opt_lib.sparse_lazy_adam_combined(
                    tw[k], slots["mu"]["towers"][k],
                    slots["nu"]["towers"][k], slot, c, valid, lr,
                    state.step, grad_scale=scale,
                )
        new_params = {**new_dense, "towers": new_tw}
        new_opt = {
            s: {**new_dense_opt[s], "towers": new_slots_tw[s]}
            for s in new_dense_opt
        }
        return new_params, new_opt

    def _step_core_sparse(self, class_weights):
        """Sparse-embedding-update train step
        (``TrainConfig.sparse_table_updates``).

        The batch's table rows are gathered up front and spliced into a
        *virtual* params tree (tables of exactly B rows, ids remapped to
        ``arange(B)`` with the true ids carried via ``mask_ids`` for
        accidental-hit masking), so autodiff produces per-occurrence
        [B, D] row gradients instead of a dense [V, D] scatter; the
        update tail is :meth:`_sparse_apply`. Numerically equivalent to
        the dense step; O(B·D) instead of O(V·D)."""
        cfg = self.config

        def step_fn(state: TrainState, batch) -> tuple[TrainState, Dict]:
            rng = _dropout_key(
                cfg.train.dropout_rng_impl, state.rng, state.step
            )
            params = state.params
            tw = params["towers"]
            b = batch["user_id"].shape[0]
            uid = jnp.clip(batch["user_id"], 0, tw["user_table"].shape[0] - 1)
            mid = jnp.clip(batch["movie_id"], 0, tw["item_table"].shape[0] - 1)
            bid = jnp.clip(batch["movie_id"], 0, tw["item_bias"].shape[0] - 1)
            virt_tw = {
                **tw,
                "user_table": jnp.take(tw["user_table"], uid, axis=0),
                "item_table": jnp.take(tw["item_table"], mid, axis=0),
                "item_bias": jnp.take(tw["item_bias"], bid),
            }
            ar = jnp.arange(b, dtype=jnp.int32)
            vbatch = {
                **batch,
                "user_id": ar,
                "movie_id": ar,
                "mask_ids": batch["movie_id"],
            }
            (loss, metrics), grads = jax.value_and_grad(
                MultiTaskModel.loss, has_aux=True
            )(
                {**params, "towers": virt_tw},
                cfg.model,
                vbatch,
                key=rng,
                train=True,
                class_weights=class_weights,
                extra_candidates=self._cache_tuple(state),
            )
            new_cache = self._cache_update(state, params, batch)
            new_params, new_opt = self._sparse_apply(
                state, grads, uid, mid, bid
            )
            return (
                TrainState(new_params, new_opt, state.step + 1,
                           state.rng, new_cache),
                metrics,
            )

        return step_fn

    def _step_core_spmd(self, class_weights, use_explicit_negs: bool,
                        sparse: bool = False):
        """Explicit-SPMD train step: forward/backward run inside a
        ``shard_map`` over the (data, model) mesh, so

        * row-sharded embedding tables are read through the psum or
          all-to-all lookup bodies (``embed/table.py``) — the collective
          exchange executes INSIDE the gradient step and its transpose
          (scatter-add into local rows) is derived by autodiff
          (SURVEY §2.3 "row-sharded embedding engine"),
        * the in-batch softmax scope is explicit: per-replica
          [B_local, B_local] (reference MirroredStrategy parity,
          ``/root/reference/src/models.py:116,137``) or global via
          ``lax.all_gather`` over the data axis
          (``TrainConfig.global_negatives``),
        * gradients are pmean'd over the data axis in-body (grad of the
          global mean loss = pmean of per-shard local-mean grads).

        The optimizer update runs outside the shard_map under the
        enclosing jit (slot variables inherit the table sharding).
        Numerically equivalent to the jit/GSPMD path when
        ``global_negatives=True`` — asserted by
        ``tests/test_trainer_spmd.py`` on a 2x2 CPU mesh."""
        from jax import lax as _lax

        from recsys_tpu.embed.table import (
            a2a_capacity, lookup_a2a_inside, lookup_psum_inside,
        )

        cfg = self.config
        ctx = self.ctx
        opt = self.optimizer
        rows = cfg.mesh.embedding_sharding == "rows" and ctx.n_model > 1
        strategy = cfg.mesh.lookup_strategy if rows else None
        glob = cfg.train.global_negatives
        n_model = ctx.n_model
        cap_factor = cfg.mesh.lookup_capacity_factor
        rng_impl = cfg.train.dropout_rng_impl
        # CBNS cache composition (VERDICT r4 item 8): the FIFO is
        # replicated state — it enters the shard_map as P() (cast
        # varying in-body so it concatenates with the varying in-batch
        # candidates), and the new batch's item embeddings come back
        # batch-sharded for the FIFO append outside the shard_map
        has_cache = cfg.train.negative_cache > 0

        def param_spec(path, leaf):
            names = [p.key for p in path if hasattr(p, "key")]
            if rows and names and names[-1] in ("user_table", "item_table"):
                return P(ctx.model_axis, None)
            return P()

        def batch_spec(leaf):
            return P(ctx.data_axis, *([None] * (leaf.ndim - 1)))

        def a2a_overflow(ids, rows_per_shard, cap):
            # per-destination demand beyond the fixed bucket capacity —
            # mirrors the bucketing inside lookup_a2a_inside
            owner = jnp.clip(ids // rows_per_shard, 0, n_model - 1)
            counts = jnp.zeros((n_model,), jnp.int32).at[owner].add(1)
            return jnp.sum(jnp.maximum(counts - cap, 0))

        def grad_body(params, batch, rng_base, step, cache=None):
            b_local = batch["user_id"].shape[0]
            # per-(data-slot, step) dropout stream: fold the slot index
            # in so rows on different data shards draw independent masks
            slot = _lax.axis_index(ctx.data_axis)
            if rng_impl == "rbg":
                data = jnp.stack([
                    rng_base[0].astype(jnp.uint32),
                    rng_base[1].astype(jnp.uint32),
                    step.astype(jnp.uint32),
                    jnp.uint32(0x5EED) ^ slot.astype(jnp.uint32),
                ])
                key = jax.random.wrap_key_data(data, impl="rbg")
            else:
                key = jax.random.fold_in(
                    jax.random.fold_in(rng_base, step), slot
                )

            lookup = None
            overflow = None
            if strategy == "a2a":
                def lookup(table_shard, ids):  # noqa: F811
                    # capacity sized from THIS call's id count (static at
                    # trace time): the explicit-negatives path pushes
                    # [B_local * K] flattened ids through the same
                    # closure, which a capacity sized from b_local alone
                    # would silently overflow into zero rows
                    cap = a2a_capacity(ids.shape[0], n_model, cap_factor)
                    out, _ = lookup_a2a_inside(
                        table_shard, ids, ctx.model_axis, n_model, cap
                    )
                    # reclaim replication AT THE SOURCE: the assembled
                    # rows are numerically identical on every model
                    # replica (same replicated ids, same exchange) but
                    # the all_to_all leaves them vma-varying over model.
                    # An exact pmean makes every downstream consumer —
                    # loss, metrics, the flash-CE custom_vjp — see a
                    # model-invariant value, and its transpose hands
                    # each replica a 1/n_model cotangent whose backward
                    # a2a contributions re-sum to exactly dL/drow.
                    return _lax.pmean(out, ctx.model_axis)

                cap_b = a2a_capacity(b_local, n_model, cap_factor)
                tw = params["towers"]
                overflow = (
                    a2a_overflow(batch["user_id"],
                                 tw["user_table"].shape[0], cap_b)
                    + a2a_overflow(batch["movie_id"],
                                   tw["item_table"].shape[0], cap_b)
                ).astype(jnp.float32)
                if use_explicit_negs:
                    neg_flat = batch["neg_ids"].reshape(-1)
                    overflow = overflow + a2a_overflow(
                        neg_flat, tw["item_table"].shape[0],
                        a2a_capacity(neg_flat.shape[0], n_model, cap_factor),
                    ).astype(jnp.float32)
            elif rows:
                # psum body; also the fallback when lookup_strategy is
                # "xla" but another reason forced the explicit step (a
                # plain gather inside shard_map would read shard-local
                # row offsets as global ids)
                def lookup(table_shard, ids):  # noqa: F811
                    return lookup_psum_inside(table_shard, ids, ctx.model_axis)

            neg_ids = batch.pop("neg_ids") if use_explicit_negs else None
            extra_cands = None
            emb_c = corr_c = None
            if has_cache:
                from recsys_tpu.models.towers import TwoTower

                # the cache the LOSS consumes: replicated FIFO, cast
                # varying over DATA only — the in-batch candidates it
                # concatenates with are data-varying but model-INVARIANT
                # (the a2a lookup pmean-reclaims model replication at
                # the source), and the loss must stay model-invariant
                extra_cands = tuple(
                    _lax.pcast(x, ctx.data_axis, to="varying")
                    for x in cache
                )
                # the cache the FIFO gains: THIS batch's item
                # embeddings (pre-update params — the encodings this
                # step scored), computed through the collective lookup
                # when tables are row-sharded
                tw0 = params["towers"]
                mid0 = batch["movie_id"]
                emb_c = _lax.stop_gradient(TwoTower.item_embed(
                    tw0, mid0, cfg.model, train=False, lookup=lookup))
                corr_c = jnp.zeros((b_local,), jnp.float32)
                if cfg.model.use_item_bias:
                    nb = tw0["item_bias"].shape[0] - 1
                    corr_c = corr_c + jnp.take(
                        tw0["item_bias"], jnp.clip(mid0, 0, nb))
                if "log_q" in batch:
                    corr_c = corr_c - batch["log_q"]
                corr_c = _lax.stop_gradient(corr_c)
            loss_params, loss_batch, loss_lookup = params, batch, lookup
            if sparse:
                # virtual-rows trick inside the SPMD body: gather the
                # batch's rows THROUGH the collective lookup (values
                # only — stop_gradient), splice them in as [B_local, D]
                # leaves, and differentiate those. Autodiff then never
                # produces a dense [V_shard, D] table gradient; the
                # per-occurrence row grads flow out batch-sharded and
                # _sparse_apply scatters them under the enclosing jit.
                # (Overflowed a2a ids — served a zero row — still get a
                # row gradient here, computed at the zero embedding;
                # the dense path drops them entirely. Identical when
                # overflow = 0, which capacity_factor headroom ensures.)
                tw = params["towers"]
                uid_l, mid_l = batch["user_id"], batch["movie_id"]
                if loss_lookup is not None:
                    rows_u = _lax.stop_gradient(
                        loss_lookup(tw["user_table"], uid_l))
                    rows_i = _lax.stop_gradient(
                        loss_lookup(tw["item_table"], mid_l))
                else:
                    rows_u = _lax.stop_gradient(jnp.take(
                        tw["user_table"],
                        jnp.clip(uid_l, 0, tw["user_table"].shape[0] - 1),
                        axis=0))
                    rows_i = _lax.stop_gradient(jnp.take(
                        tw["item_table"],
                        jnp.clip(mid_l, 0, tw["item_table"].shape[0] - 1),
                        axis=0))
                bias_rows = _lax.stop_gradient(jnp.take(
                    tw["item_bias"],
                    jnp.clip(mid_l, 0, tw["item_bias"].shape[0] - 1)))
                # (the a2a lookup closure already pmean-reclaims model
                # replication at the source, so rows_u/rows_i are
                # model-invariant here)
                virt_tw = {**tw, "user_table": rows_u,
                           "item_table": rows_i, "item_bias": bias_rows}
                loss_params = {**params, "towers": virt_tw}
                ar = jnp.arange(b_local, dtype=jnp.int32)
                loss_batch = {**batch, "user_id": ar, "movie_id": ar,
                              "mask_ids": batch["movie_id"]}
                loss_lookup = None  # virtual tables are local [B, D]
            # Differentiate the EXPLICIT global objective, not the
            # per-slot loss: gl = pmean(L_s) (plus a model-axis pmean
            # when the a2a lookup makes the loss value vma-varying over
            # model). This makes every leaf's gradient exactly dL̄/dleaf
            # with the vma bookkeeping doing the work — replicated
            # leaves get their cross-slot psum from the pvary transpose
            # at the right magnitude, sharded table shards get their own
            # slice, and sparse virtual rows get per-occurrence dL̄.
            # Differentiating the raw per-slot L_s instead returns
            # grads scaled by the axis size for replicated leaves
            # (the pvary transpose psums WITHOUT the 1/n): measured 4x
            # on a data=4 mesh — invisible under clipnorm (scale
            # invariance) until the sparse path mixed the two scalings.
            def global_loss(p):
                loss, metrics = MultiTaskModel.loss(
                    p,
                    cfg.model,
                    loss_batch,
                    key=key,
                    train=True,
                    class_weights=class_weights,
                    # data_axis is always set in-body (global BCE weight
                    # normalization); global_negatives alone decides
                    # whether the retrieval candidates are all-gathered
                    data_axis=ctx.data_axis,
                    global_negatives=glob,
                    neg_item_ids=neg_ids,
                    lookup=loss_lookup,
                    data_axis_size=ctx.n_data,
                    extra_candidates=extra_cands,
                )
                # (no model-axis pmean needed: the a2a lookup reclaims
                # model replication at the source, so the loss is
                # already model-invariant)
                gl = _lax.pmean(loss, ctx.data_axis)
                return gl, metrics

            (loss, metrics), grads = jax.value_and_grad(
                global_loss, has_aux=True
            )(loss_params)
            metrics = jax.tree.map(
                lambda m: _lax.pmean(m, ctx.data_axis), metrics
            )
            if overflow is not None:
                metrics["lookup_overflow"] = _lax.pmean(
                    overflow, ctx.data_axis
                )
            if has_cache:
                return grads, metrics, (emb_c, corr_c)
            return grads, metrics

        def grad_spec(path, leaf):
            # sparse mode: the three table leaves come back as
            # per-occurrence row grads, batch-sharded over data
            names = [p.key for p in path if hasattr(p, "key")]
            if sparse and names and names[-1] in ("user_table", "item_table"):
                return P(ctx.data_axis, None)
            if sparse and names and names[-1] == "item_bias":
                return P(ctx.data_axis)
            return param_spec(path, leaf)

        def step_fn(state: TrainState, batch) -> tuple[TrainState, Dict]:
            params_specs = jax.tree_util.tree_map_with_path(
                param_spec, state.params
            )
            grads_specs = jax.tree_util.tree_map_with_path(
                grad_spec, state.params
            )
            batch_specs = jax.tree.map(batch_spec, batch)
            metric_names = ("loss", "retrieval_loss", "rating_mse",
                            "ctr_bce", "l2")
            metric_specs = {k: P() for k in metric_names}
            if strategy == "a2a":
                metric_specs["lookup_overflow"] = P()
            # check_vma=True is load-bearing, not hygiene: with the
            # varying-manual-axes check off, the transpose of the
            # lookup's lax.psum is another psum instead of identity and
            # every table gradient comes back multiplied by n_model
            # (measured 2x on a model=2 mesh).
            new_cache = state.extras
            if has_cache:
                grads, metrics, (emb_c, corr_c) = jax.shard_map(
                    grad_body,
                    mesh=ctx.mesh,
                    in_specs=(params_specs, batch_specs, P(), P(), P()),
                    out_specs=(grads_specs, metric_specs,
                               (P(ctx.data_axis, None), P(ctx.data_axis))),
                    check_vma=True,
                )(state.params, batch, state.rng, state.step,
                  self._cache_tuple(state))
                c = state.extras
                bsz = batch["movie_id"].shape[0]
                new_cache = {
                    "emb": jnp.concatenate(
                        [c["emb"][bsz:], emb_c.astype(c["emb"].dtype)]),
                    "ids": jnp.concatenate(
                        [c["ids"][bsz:],
                         batch["movie_id"].astype(c["ids"].dtype)]),
                    "corr": jnp.concatenate([c["corr"][bsz:], corr_c]),
                }
            else:
                grads, metrics = jax.shard_map(
                    grad_body,
                    mesh=ctx.mesh,
                    in_specs=(params_specs, batch_specs, P(), P()),
                    out_specs=(grads_specs, metric_specs),
                    check_vma=True,
                )(state.params, batch, state.rng, state.step)
            if sparse:
                # row grads -> dense-semantics touched-rows update under
                # the enclosing jit: XLA partitions the combine/scatter
                # against the model-sharded tables (same machinery as
                # the GSPMD sparse path, test_sparse_table_updates_*)
                tw = state.params["towers"]
                uid = jnp.clip(batch["user_id"], 0,
                               tw["user_table"].shape[0] - 1)
                mid = jnp.clip(batch["movie_id"], 0,
                               tw["item_table"].shape[0] - 1)
                bid = jnp.clip(batch["movie_id"], 0,
                               tw["item_bias"].shape[0] - 1)
                new_params, new_opt = self._sparse_apply(
                    state, grads, uid, mid, bid
                )
            else:
                new_params, new_opt = opt.update(
                    grads, state.opt_state, state.params, state.step
                )
            return TrainState(new_params, new_opt, state.step + 1,
                              state.rng, new_cache), metrics

        return step_fn

    # ---- device-resident epoch (one compiled call per epoch) ---------
    def make_train_epoch(self, class_weights, n_rows: int, n_steps: int,
                         use_explicit_negs: bool = False):
        """Whole-epoch compiled function over device-resident data:
        on-device shuffle (jax.random.permutation) + per-step gather +
        train step, all inside one lax.scan — zero host->device traffic
        per step (the TPU-native answer to tf.data, SURVEY §7.1.5)."""
        cfg = self.config
        b = cfg.train.batch_size
        self._check_cache_config(b)
        ctx = self.ctx
        step_fn = self._step_core(class_weights, use_explicit_negs)
        shape = jax.eval_shape(lambda s: s, self._state_for_shape)
        state_sh = self.state_shardings(shape)
        def _bspec(v):
            return NamedSharding(
                ctx.mesh, P(ctx.data_axis, *([None] * (v.ndim - 1)))
            )
        perm_key = jax.random.PRNGKey(cfg.train.seed ^ 0x5EED)

        def epoch_fn(state: TrainState, data: Dict, epoch_idx) -> tuple:
            perm = jax.random.permutation(
                jax.random.fold_in(perm_key, epoch_idx), n_rows
            )

            def body(s, step_idx):
                idx = jax.lax.dynamic_slice_in_dim(perm, step_idx * b, b)
                batch = {
                    k: jax.lax.with_sharding_constraint(
                        jnp.take(v, idx, axis=0), _bspec(v)
                    )
                    for k, v in data.items()
                }
                return step_fn(s, batch)

            state, ms = jax.lax.scan(body, state, jnp.arange(n_steps))
            return state, jax.tree.map(jnp.mean, ms)

        donate = (0,) if cfg.train.donate_state else ()
        rep = NamedSharding(ctx.mesh, P())
        return jax.jit(
            epoch_fn,
            in_shardings=(state_sh, None, None),
            out_shardings=(state_sh, rep),
            donate_argnums=donate,
        )

    def make_val_epoch(self, class_weights, n_steps: int):
        """Whole-val-split compiled loss pass (mask-weighted means)."""
        cfg = self.config
        b = cfg.train.batch_size

        def val_fn(params, data: Dict) -> Dict:
            def body(carry, step_idx):
                batch = {
                    k: jax.lax.dynamic_slice_in_dim(v, step_idx * b, b)
                    for k, v in data.items()
                }
                _, metrics = MultiTaskModel.loss(
                    params, cfg.model, batch, train=False,
                    class_weights=class_weights,
                )
                w = jnp.sum(batch.get("mask", jnp.ones(b)))
                sums, wsum = carry
                sums = jax.tree.map(lambda a, m: a + m * w, sums, metrics)
                return (sums, wsum + w), None

            zero = {k: jnp.float32(0.0) for k in
                    ("loss", "retrieval_loss", "rating_mse", "ctr_bce", "l2")}
            (sums, wsum), _ = jax.lax.scan(
                body, (zero, jnp.float32(0.0)), jnp.arange(n_steps)
            )
            return jax.tree.map(lambda a: a / jnp.maximum(wsum, 1.0), sums)

        return jax.jit(val_fn)

    def make_eval_step(self, class_weights, example_batch):
        cfg = self.config
        batch_sh = self.batch_sharding_tree(example_batch)

        def eval_fn(params, batch) -> Dict:
            _, metrics = MultiTaskModel.loss(
                params, cfg.model, batch, train=False, class_weights=class_weights
            )
            return metrics

        return jax.jit(eval_fn, in_shardings=(None, batch_sh),
                       out_shardings=NamedSharding(self.ctx.mesh, P()))

    # ---- the training loop ------------------------------------------
    def train(self, bundle: Dict[str, np.ndarray]) -> Dict[str, float]:
        cfg = self.config
        t_cfg = cfg.train
        n_users = int(bundle["meta/n_users"])
        n_items = int(bundle["meta/n_movies"])
        logger.info("training: %d users, %d items, mesh=%s", n_users, n_items,
                    dict(self.ctx.mesh.shape))
        if t_cfg.debug_nans:
            from recsys_tpu.utils.debug import enable_nan_checks

            enable_nan_checks()
        self.writer.write_config(cfg)

        # class weights (src/trainer.py:139-146)
        if t_cfg.use_class_weights:
            class_weights = losses.balanced_class_weights(bundle["train/y_implicit"])
        else:
            class_weights = (1.0, 1.0)

        # engineered dense features for the ranking heads
        # (ModelConfig.dense_features > 0): fit on train, standardized
        # with the train scaler, one [N, F] matrix per split. The fitted
        # engineer ships in the inference bundle for serving-time rerank.
        dense_feats = None
        self._feature_engineer = None
        if cfg.model.dense_features > 0:
            from recsys_tpu.data.features import make_engineer

            eng = make_engineer(bundle, cfg.model.dense_features)
            dense_feats = eng.fit_transform_splits(bundle)
            self._feature_engineer = eng

        # logQ correction array: log empirical train frequency per item
        log_q_table = None
        if t_cfg.logq_correction:
            pop = np.bincount(
                bundle["train/movie_id"], minlength=n_items
            ).astype(np.float32)
            log_q_table = np.log(
                np.maximum(pop, 0.5) / max(len(bundle["train/movie_id"]), 1)
            ).astype(np.float32)

        def _augment(batch):
            if log_q_table is not None:
                batch = {**batch, "log_q": log_q_table[batch["movie_id"]]}
            return batch

        # explicit negative sampling option (never actually trained with
        # in the reference — here it is real)
        use_negs = cfg.data.negative_sampling in ("hard", "mixed", "mined")
        sampler = None
        if use_negs:
            sampler = NegativeSampler(
                cfg.data.negative_sampling,
                cfg.data.num_hard_negatives,
                cfg.data.num_random_negatives,
                seed=t_cfg.seed,
            ).fit(bundle["train/user_id"], bundle["train/movie_id"], n_items)
            if cfg.data.negative_sampling == "mined":
                # index-mined TRUE hard negatives: either injected by
                # the caller (trainer.mined_table) or mined here from a
                # previously-trained bundle (data.mined_from — the
                # two-phase recipe scripts/train.py --mined_from wires)
                if cfg.model.explicit_negatives_weight > 0.25:
                    # the measured regime map (negatives_mined.json):
                    # mined negatives at full weight LOSE 25-35%
                    # recall@10 (false-negative pressure); the only
                    # arm that didn't lose ran at 0.1x
                    logger.warning(
                        "negative_sampling='mined' with "
                        "explicit_negatives_weight=%.2f: the committed "
                        "ablation (benchmarks/results/negatives_mined."
                        "json) measured -25%% recall@10 at weight 1.0 "
                        "even with mined_skip_top=%d; the only "
                        "non-losing arm used weight 0.1 — set "
                        "model.explicit_negatives_weight=0.1",
                        cfg.model.explicit_negatives_weight,
                        cfg.data.mined_skip_top,
                    )
                table = getattr(self, "mined_table", None)
                if table is None and cfg.data.mined_from:
                    from recsys_tpu.data.negative_sampling import (
                        mine_hard_negatives,
                    )
                    from recsys_tpu.train.checkpoint import (
                        load_encoder_params,
                    )

                    logger.info("mining hard negatives from %s",
                                cfg.data.mined_from)
                    table = mine_hard_negatives(
                        load_encoder_params(cfg.data.mined_from),
                        cfg.model, bundle,
                        m=cfg.data.mined_pool_size,
                        skip_top=cfg.data.mined_skip_top,
                    )
                if table is None:
                    raise ValueError(
                        "negative_sampling='mined' needs a mined table: "
                        "set trainer.mined_table or data.mined_from "
                        "(a trained serving bundle dir)")
                sampler.set_mined(table)

        batch_cols = ("user_id", "movie_id", "rating", "y_implicit")
        if dense_feats is not None:
            bundle = {**{k: bundle[k] for k in bundle},
                      **{f"{s}/dense": v for s, v in dense_feats.items()}}
            batch_cols = batch_cols + ("dense",)
        train_batcher = Batcher(
            bundle, "train", t_cfg.batch_size, seed=t_cfg.seed,
            columns=batch_cols,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        val_batcher = Batcher(
            bundle, "val", t_cfg.batch_size, seed=t_cfg.seed, shuffle=False,
            drop_remainder=False, columns=batch_cols,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )

        state = self.init_state(n_users, n_items, t_cfg.seed)
        # initialize the learnable item softmax bias to log train
        # frequency so the logQ-corrected softmax starts balanced (see
        # models/towers.py item_bias note)
        if log_q_table is not None:
            bias_rows = state.params["towers"]["item_bias"].shape[0]
            bias0 = np.full(bias_rows, float(log_q_table.min()), np.float32)
            bias0[:n_items] = log_q_table
            new_bias = jax.device_put(
                bias0, state.params["towers"]["item_bias"].sharding
            )
            params = dict(state.params)
            params["towers"] = {**params["towers"], "item_bias": new_bias}
            state = state._replace(params=params)
        self._state_for_shape = state
        start_epoch = 0
        if t_cfg.resume:
            restored = self.ckpt.restore_latest(like=state._asdict())
            if restored is not None:
                step_idx, tree = restored
                state = TrainState(**tree) if isinstance(tree, dict) else tree
                state = jax.device_put(state, self.state_shardings(jax.eval_shape(lambda s: s, state)))
                start_epoch = int(np.asarray(state.step)) // max(train_batcher.steps_per_epoch, 1)
                logger.info("resumed from checkpoint step %d (epoch %d)", step_idx, start_epoch)

        # ---- choose data path: device-resident (one compiled call per
        # epoch, zero per-step host traffic) vs streaming ------------
        train_cols = {c: bundle[f"train/{c}"] for c in batch_cols}
        if log_q_table is not None:
            train_cols["log_q"] = log_q_table[train_cols["movie_id"]]
        data_bytes = sum(v.nbytes for v in train_cols.values())
        neg_bytes = 0
        if sampler is not None:
            neg_bytes = 4 * sampler.n_negatives() * len(train_cols["user_id"])
        device_resident = (
            t_cfg.device_resident_data
            and data_bytes + neg_bytes <= t_cfg.device_data_limit_mb * 1024 * 1024
            # multi-host runs take the streaming path: the resident path
            # builds process-local arrays (jnp.asarray of the full
            # split), which cannot feed a jit over the global mesh —
            # the streaming path's make_array_from_process_local_data
            # assembles proper global batches per step
            and jax.process_count() == 1
        )

        train_epoch = val_epoch = train_step = eval_step = None
        if device_resident:
            n_rows = len(train_cols["user_id"])
            n_steps_epoch = n_rows // t_cfg.batch_size
            train_data = {k: jnp.asarray(v) for k, v in train_cols.items()}
            # padded, masked val split on device
            n_val = len(bundle["val/user_id"])
            val_steps = max(-(-n_val // t_cfg.batch_size), 1)
            pad = val_steps * t_cfg.batch_size - n_val
            def _padcol(c):
                v = bundle[f"val/{c}"]
                widths = ((0, pad),) + ((0, 0),) * (v.ndim - 1)
                return jnp.asarray(np.pad(v, widths))
            val_data = {c: _padcol(c) for c in batch_cols}
            if log_q_table is not None:
                val_data["log_q"] = jnp.asarray(
                    log_q_table[np.asarray(val_data["movie_id"])]
                )
            val_data["mask"] = jnp.asarray(
                np.pad(np.ones(n_val, np.float32), (0, pad))
            )
            train_epoch = self.make_train_epoch(
                class_weights, n_rows, n_steps_epoch,
                use_explicit_negs=sampler is not None,
            )
            val_epoch = self.make_val_epoch(class_weights, val_steps)
            logger.info(
                "device-resident data path: %d train rows (%.1f MB), "
                "%d steps/epoch in one compiled call",
                n_rows, data_bytes / 1e6, n_steps_epoch,
            )
        else:
            example = _augment(next(iter(train_batcher.epoch(0))))
            if sampler is not None:
                example = {**example, "neg_ids": sampler.sample_batch(example["user_id"])}
            train_step = self.make_train_step(class_weights, example, sampler is not None)
            eval_example = _augment(next(iter(val_batcher.epoch(0))))
            eval_step = self.make_eval_step(class_weights, eval_example)
            # transfer coalescing (stream_chunk_steps): full chunks of K
            # batches go through one [K, B, ...] transfer + one scan
            # dispatch; the epoch tail (< K batches) takes the per-step
            # path above
            chunk_k = min(
                max(int(t_cfg.stream_chunk_steps), 1),
                max(train_batcher.steps_per_epoch, 1),
            )
            if t_cfg.checkpoint_every_steps:
                # never coalesce past the mid-epoch checkpoint cadence —
                # the user asked for a save every N steps, so a chunk
                # must not skip over a save point
                chunk_k = min(chunk_k, int(t_cfg.checkpoint_every_steps))
            train_chunk = None
            if chunk_k > 1:
                train_chunk = self.make_train_chunk(
                    class_weights, example, sampler is not None, chunk_k
                )

        if t_cfg.profile and jax.process_index() == 0:
            from jax import profiler as _profiler

            _profiler.start_trace(f"{self.output_dir}/profile")
            self._profiling = True
        else:
            self._profiling = False

        best_val = float("inf")
        best_params_host = None
        patience = 0
        steps_total = 0
        examples_total = 0
        t_train0 = time.time()
        final_epoch = start_epoch

        # graceful preemption (SURVEY §5.3): TPU-pod maintenance sends
        # SIGTERM with a grace window — finish the running epoch,
        # checkpoint, exit cleanly; --resume continues from there
        preempted = False
        self._preempt_requested = False
        prev_sig_handlers = {}
        if t_cfg.checkpoint_on_preemption:
            import signal as _signal
            import threading as _threading

            def _on_preempt_signal(signum, frame):
                logger.warning(
                    "signal %d received: checkpointing at epoch end, "
                    "then stopping (resume with --resume)", signum,
                )
                self._preempt_requested = True

            if _threading.current_thread() is _threading.main_thread():
                for _sig in (_signal.SIGTERM, _signal.SIGUSR1):
                    prev_sig_handlers[_sig] = _signal.signal(
                        _sig, _on_preempt_signal
                    )

        try:
            for epoch in range(start_epoch, t_cfg.epochs):
                final_epoch = epoch
                self.writer.start_epoch()
                t0 = time.time()
                if device_resident:
                    if sampler is not None:
                        # fresh explicit negatives each epoch, sampled
                        # vectorized on host, shipped once per epoch
                        train_data = {
                            **train_data,
                            "neg_ids": jnp.asarray(
                                sampler.sample_batch(train_cols["user_id"])
                            ),
                        }
                    state, tmetrics = train_epoch(
                        state, train_data, jnp.int32(epoch)
                    )
                    jax.block_until_ready(state.params)
                    n_steps = n_steps_epoch
                    logs = {f"train_{k}": float(v)
                            for k, v in jax.device_get(tmetrics).items()}
                else:
                    agg: Dict[str, float] = {}
                    n_steps = 0

                    def _augment_neg(batch):
                        batch = _augment(batch)
                        if sampler is not None:
                            batch = {**batch, "neg_ids": sampler.sample_batch(batch["user_id"])}
                        return batch

                    def _grouped(it):
                        buf = []
                        for b in it:
                            buf.append(b)
                            if len(buf) == chunk_k:
                                yield buf
                                buf = []
                        if buf:
                            yield buf

                    def _prepare(group):
                        group = [_augment_neg(b) for b in group]
                        if len(group) == chunk_k and train_chunk is not None:
                            stacked = {
                                k: np.stack([b[k] for b in group])
                                for k in group[0]
                            }
                            return (len(group), shard_batch_chunk(self.ctx, stacked))
                        return (0, [shard_batch(self.ctx, b) for b in group])

                    def _log_or_ckpt(metrics, prev_steps):
                        def crossed(every):
                            return every and n_steps // every > prev_steps // every

                        if crossed(t_cfg.log_every_steps) or prev_steps == 0:
                            m = jax.device_get(metrics)
                            for k, v in m.items():
                                agg[k] = agg.get(k, 0.0) + float(v)
                            agg["_agg_count"] = agg.get("_agg_count", 0) + 1
                        if crossed(t_cfg.checkpoint_every_steps):
                            # mid-epoch safety checkpoint for long
                            # streaming epochs (the device-resident path
                            # is one compiled call — per-epoch there)
                            self.ckpt.save(
                                int(np.asarray(state.step)),
                                state._asdict(),
                                metrics={"mid_epoch": float(epoch)},
                            )

                    for csize, placed in _prefetch(
                            _grouped(train_batcher.epoch(epoch)), _prepare):
                        if csize:
                            prev = n_steps
                            state, metrics = train_chunk(state, placed)
                            n_steps += csize
                            _log_or_ckpt(metrics, prev)
                        else:
                            for b in placed:
                                prev = n_steps
                                state, metrics = train_step(state, b)
                                n_steps += 1
                                _log_or_ckpt(metrics, prev)
                    jax.block_until_ready(state.params)
                    count = max(agg.pop("_agg_count", 1), 1)
                    logs = {f"train_{k}": v / count for k, v in agg.items()}
                if self._profiling:
                    from jax import profiler as _profiler

                    _profiler.stop_trace()
                    self._profiling = False
                    logger.info("profiler trace -> %s/profile", self.output_dir)
                epoch_time = time.time() - t0
                steps_total += n_steps
                examples_total += n_steps * t_cfg.batch_size
                logs["examples_per_s"] = n_steps * t_cfg.batch_size / max(epoch_time, 1e-9)
                if logs.get("train_lookup_overflow", 0.0) > 0:
                    # overflowing ids are served a ZERO embedding row —
                    # training silently degrades, so alarm loudly with
                    # the knob that fixes it (docs/DESIGN.md "a2a cost
                    # model" derives the capacity sizing)
                    logger.warning(
                        "a2a lookup overflow: %.1f ids/step (mean) exceeded "
                        "the per-shard exchange capacity and were served "
                        "zero rows. Raise mesh.lookup_capacity_factor "
                        "(currently %.2f; capacity = ceil(factor * B_local "
                        "/ n_shards) per (src, dst) shard pair) until "
                        "lookup_overflow reports 0.",
                        logs["train_lookup_overflow"],
                        cfg.mesh.lookup_capacity_factor,
                    )

                # validation loss (for early stopping, parity with val_loss monitor)
                if device_resident:
                    vm = jax.device_get(val_epoch(state.params, val_data))
                    logs.update({f"val_{k}": float(v) for k, v in vm.items()})
                else:
                    v_agg: Dict[str, float] = {}
                    v_steps = 0
                    for batch in val_batcher.epoch(0):
                        placed = shard_batch(self.ctx, _augment(batch))
                        m = jax.device_get(eval_step(state.params, placed))
                        for k, v in m.items():
                            v_agg[k] = v_agg.get(k, 0.0) + float(v)
                        v_steps += 1
                    logs.update({f"val_{k}": v / max(v_steps, 1) for k, v in v_agg.items()})

                # periodic sampled retrieval eval (recall-based early stopping)
                if t_cfg.eval_every_epochs and (epoch + 1) % t_cfg.eval_every_epochs == 0:
                    sample_cfg = dataclasses.replace(
                        cfg.eval,
                        eval_sample=cfg.eval.eval_sample or 20_000,
                        topk=(10,),
                    )
                    # single-controller: hand evaluate() the DEVICE
                    # params — its compute is jitted, so no multi-GB
                    # device->host table pull per eval (VERDICT r2 weak
                    # #5); only top-k ids/metrics come back. Multi-host
                    # keeps the host pull (cross-process sharded reads
                    # are not np.asarray-able).
                    eval_params = (
                        state.params if jax.process_count() == 1
                        else jax.device_get(state.params)
                    )
                    quick = evaluate(
                        eval_params, cfg.model, bundle, "val",
                        sample_cfg, seed=t_cfg.seed,
                        dense=None if dense_feats is None else dense_feats["val"],
                    )
                    logs["val_recall@10"] = quick["recall@10"]

                if (t_cfg.replication_check_every_epochs
                        and (epoch + 1) % t_cfg.replication_check_every_epochs == 0
                        and self.ctx.n_data > 1):
                    from recsys_tpu.utils.debug import assert_replicated

                    sums = assert_replicated(
                        state.params, self.ctx.mesh, self.ctx.data_axis
                    )
                    logs["replica_checksum"] = float(sums[0])

                entry = self.writer.end_epoch(epoch, logs)
                if self._preempt_requested:
                    self.ckpt.save(
                        int(np.asarray(state.step)), state._asdict(),
                        metrics={"val_loss": logs.get("val_loss", float("nan"))},
                    )
                    preempted = True
                    logger.info(
                        "preemption checkpoint saved (epoch %d, step %d)",
                        epoch, int(np.asarray(state.step)),
                    )
                    break
                monitor = t_cfg.early_stop_metric
                sign = -1.0 if "recall" in monitor or "auc" in monitor else 1.0
                value = logs.get(monitor)
                if value is None and monitor != "val_loss":
                    # monitor not computed this epoch (eval_every_epochs
                    # cadence): do not update best/patience with a
                    # different-scaled fallback — just checkpoint
                    self.ckpt.save(
                        int(np.asarray(state.step)), state._asdict(),
                        metrics={"val_loss": logs.get("val_loss", float("nan"))},
                    )
                    continue
                if value is None:
                    value = logs.get("val_loss", float("inf"))
                score = sign * value  # lower is better

                is_best = score < best_val
                if is_best:
                    best_val = score
                    best_params_host = jax.device_get(state.params)
                    patience = 0
                else:
                    patience += 1
                self.ckpt.save(
                    int(np.asarray(state.step)), state._asdict(),
                    metrics={monitor: value}, is_best=is_best,
                )
                if patience >= t_cfg.early_stop_patience:
                    logger.info("early stopping at epoch %d (best %s %.4f)",
                                epoch, monitor, sign * best_val)
                    break

        finally:
            # restore handlers even when training raises: leaving
            # SIGTERM bound to a flag-setter no loop reads would make
            # the process unkillable-by-TERM for its remaining lifetime
            if prev_sig_handlers:
                import signal as _signal

                for _sig, _h in prev_sig_handlers.items():
                    _signal.signal(_sig, _h)

        # restore best weights (EarlyStopping(restore_best_weights=True) parity)
        if not preempted and best_params_host is not None:
            state = state._replace(params=jax.device_put(
                best_params_host,
                self.state_shardings(jax.eval_shape(lambda s: s, state)).params,
            ))

        wall = time.time() - t_train0
        if preempted:
            # exit inside the preemption grace window: the latest-step
            # checkpoint is on disk, --resume picks it up; skip the full
            # eval + bundle export
            report = {
                "preempted": True,
                "train_wall_time_s": wall,
                "epochs_run": final_epoch + 1,
                "resume_step": int(np.asarray(state.step)),
            }
            self.writer.write_final_metrics(report)
            self.writer.close()
            self.final_state = state
            return report
        # offline full-metric eval (upgraded _evaluate, src/trainer.py:195-219)
        # — device params in the single-controller case (weak #5: no
        # full-table host pull just to evaluate)
        report = evaluate(
            state.params if jax.process_count() == 1
            else jax.device_get(state.params),
            cfg.model, bundle, "val", cfg.eval,
            seed=t_cfg.seed,
            dense=None if dense_feats is None else dense_feats["val"],
        )
        report["train_wall_time_s"] = wall
        report["examples_per_s"] = examples_total / max(wall, 1e-9)
        report["epochs_run"] = final_epoch + 1
        self.writer.write_final_metrics(report)
        self.writer.close()

        # serving artifacts (replaces _save_artifacts + _build_faiss):
        # export inherently writes host npz files — ONE pull, reused
        host_params = jax.device_get(state.params)
        index = RetrievalIndex.build(
            host_params["towers"], cfg.model, n_items,
            bundle["meta/movie_raw_ids"],
        )
        ckpt_lib.save_inference_bundle(
            f"{self.output_dir}/serving",
            host_params["towers"],
            cfg,
            bundle["meta/user_raw_ids"],
            bundle["meta/movie_raw_ids"],
            index=index,
            full_params=host_params,
            feature_state=(
                self._feature_engineer.state_dict()
                if self._feature_engineer is not None else None
            ),
        )
        self.final_state = state
        return report
