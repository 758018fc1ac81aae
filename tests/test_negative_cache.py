"""CBNS cross-batch negative cache (TrainConfig.negative_cache —
arXiv:2110.15154): loss-level semantics, flash parity, trainer FIFO,
SPMD/sparse/chunked composition (round 5), and the per-replica-scope
rejection."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.config import EvalConfig, ModelConfig, RecsysConfig, TrainConfig
from recsys_tpu.models import losses
from recsys_tpu.parallel.mesh import make_mesh
from recsys_tpu.train.trainer import Trainer


def _data(b=32, d=16, n_extra=24, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "u": jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)),
        "v": jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)),
        "ids": jnp.asarray(rng.integers(0, 20, b).astype(np.int32)),
        "logq": jnp.asarray(rng.normal(size=b).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=b).astype(np.float32)),
        "x_emb": jnp.asarray(rng.normal(size=(n_extra, d)).astype(np.float32)),
        "x_ids": jnp.asarray(rng.integers(0, 20, n_extra).astype(np.int32)),
        "x_corr": jnp.asarray(rng.normal(size=n_extra).astype(np.float32)),
    }


def _dense_reference(u, v, ids, logq, bias, x_emb, x_ids, x_corr):
    """Straight NumPy: candidates = [batch | cache], diag positives,
    accidental masking across BOTH segments."""
    b = u.shape[0]
    cand = np.concatenate([np.asarray(v), np.asarray(x_emb)])
    corr = np.concatenate([np.asarray(bias) - np.asarray(logq),
                           np.asarray(x_corr)])
    cand_ids = np.concatenate([np.asarray(ids), np.asarray(x_ids)])
    logits = np.asarray(u) @ cand.T + corr[None, :]
    col = np.arange(cand.shape[0])[None, :]
    accidental = (np.asarray(ids)[:, None] == cand_ids[None, :]) & (
        col != np.arange(b)[:, None])
    logits = np.where(accidental, -1e9, logits)
    lse = np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1)) \
        + logits.max(1)
    pos = logits[np.arange(b), np.arange(b)]
    return float(np.mean(lse - pos))


def test_extra_candidates_matches_dense_reference():
    d = _data()
    got = float(losses.in_batch_softmax(
        d["u"], d["v"], item_ids=d["ids"], log_q=d["logq"],
        item_bias=d["bias"],
        extra_candidates=(d["x_emb"], d["x_ids"], d["x_corr"])))
    want = _dense_reference(d["u"], d["v"], d["ids"], d["logq"], d["bias"],
                            d["x_emb"], d["x_ids"], d["x_corr"])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_extra_candidates_empty_slots_are_exact_noops():
    """corr=-1e9 slots contribute exp(-inf)=0: bit-equal to no cache."""
    d = _data()
    n = 16
    empty = (jnp.zeros((n, d["u"].shape[1]), jnp.float32),
             jnp.full((n,), -1, jnp.int32),
             jnp.full((n,), -1e9, jnp.float32))
    with_cache = float(losses.in_batch_softmax(
        d["u"], d["v"], item_ids=d["ids"], log_q=d["logq"],
        item_bias=d["bias"], extra_candidates=empty))
    without = float(losses.in_batch_softmax(
        d["u"], d["v"], item_ids=d["ids"], log_q=d["logq"],
        item_bias=d["bias"]))
    np.testing.assert_allclose(with_cache, without, rtol=1e-6)


def test_extra_candidates_stop_gradient_and_grads():
    """Gradients flow to u/v (matching the dense reference via jax
    autodiff on a hand-built dense twin) and NOT to the cache."""
    d = _data()

    def jax_dense_twin(u, v, x_emb):
        b = u.shape[0]
        cand = jnp.concatenate([v, x_emb])
        corr = jnp.concatenate([d["bias"] - d["logq"], d["x_corr"]])
        cand_ids = jnp.concatenate([d["ids"], d["x_ids"]])
        logits = u @ cand.T + corr[None, :]
        col = jnp.arange(cand.shape[0])[None, :]
        accidental = (d["ids"][:, None] == cand_ids[None, :]) & (
            col != jnp.arange(b)[:, None])
        logits = jnp.where(accidental, -1e9, logits)
        pos = logits[jnp.arange(b), jnp.arange(b)]
        return jnp.mean(jax.nn.logsumexp(logits, axis=-1) - pos)

    gu, gv, gx = jax.grad(
        lambda u, v, x: losses.in_batch_softmax(
            u, v, item_ids=d["ids"], log_q=d["logq"], item_bias=d["bias"],
            extra_candidates=(x, d["x_ids"], d["x_corr"])),
        argnums=(0, 1, 2))(d["u"], d["v"], d["x_emb"])
    ru, rv, _ = jax.grad(jax_dense_twin, argnums=(0, 1, 2))(
        d["u"], d["v"], d["x_emb"])
    np.testing.assert_allclose(np.asarray(gu), np.asarray(ru),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=1e-4, atol=1e-6)
    # the cache is a stop-gradient constant
    assert float(jnp.max(jnp.abs(gx))) == 0.0


def test_flash_extra_candidates_matches_xla():
    from recsys_tpu.ops.pallas.flash_ce import in_batch_softmax_flash

    d = _data()
    extras = (d["x_emb"], d["x_ids"], d["x_corr"])
    a = float(in_batch_softmax_flash(
        d["u"], d["v"], d["ids"], log_q=d["logq"], item_bias=d["bias"],
        bf16=False, extra_candidates=extras))
    r = float(losses.in_batch_softmax(
        d["u"], d["v"], item_ids=d["ids"], log_q=d["logq"],
        item_bias=d["bias"], extra_candidates=extras))
    np.testing.assert_allclose(a, r, rtol=1e-5)
    ga = jax.grad(
        lambda u, v: in_batch_softmax_flash(
            u, v, d["ids"], log_q=d["logq"], item_bias=d["bias"],
            bf16=False, extra_candidates=extras),
        argnums=(0, 1))(d["u"], d["v"])
    gr = jax.grad(
        lambda u, v: losses.in_batch_softmax(
            u, v, item_ids=d["ids"], log_q=d["logq"], item_bias=d["bias"],
            extra_candidates=extras),
        argnums=(0, 1))(d["u"], d["v"])
    for x, y in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-6)


# ---- trainer integration -------------------------------------------------

_TINY = ModelConfig(embedding_dim=16, user_tower_dims=(32,),
                    item_tower_dims=(32,), cross_layers=1, dnn_dims=(16,),
                    dropout_rate=0.0, mixed_precision=False)


def _batch(b, n_users, n_items, seed):
    rng = np.random.default_rng(seed)
    return {
        "user_id": rng.integers(0, n_users, b).astype(np.int32),
        "movie_id": rng.integers(0, n_items, b).astype(np.int32),
        "rating": rng.uniform(1, 5, b).astype(np.float32),
        "y_implicit": (rng.random(b) > 0.4).astype(np.float32),
        "log_q": np.full(b, -np.log(n_items), np.float32),
    }


def _make_trainer(cache, sparse=False, b=64):
    cfg = RecsysConfig(
        model=_TINY,
        train=TrainConfig(batch_size=b, epochs=1, negative_cache=cache,
                          sparse_table_updates=sparse, donate_state=False),
        eval=EvalConfig(topk=(5,)),
    )
    ctx = make_mesh(model_parallel=1)
    tr = Trainer(cfg, output_dir=f"/tmp/negcache_{os.getpid()}",
                 mesh_ctx=ctx)
    state = tr.init_state(40, 30, seed=0)
    tr._state_for_shape = state
    return tr, state


@pytest.mark.parametrize("sparse", [False, True])
def test_trainer_cache_fifo_and_first_step_equivalence(sparse):
    b = 64
    tr, state = _make_trainer(cache=2 * b, sparse=sparse, b=b)
    batches = [_batch(b, 40, 30, s) for s in range(3)]
    step = tr.make_train_step(class_weights=(1.2, 0.9),
                              example_batch=batches[0],
                              use_explicit_negs=False)

    # step 1 with an EMPTY cache == the no-cache config exactly
    tr0, state0 = _make_trainer(cache=0, sparse=sparse, b=b)
    step0 = tr0.make_train_step(class_weights=(1.2, 0.9),
                                example_batch=batches[0],
                                use_explicit_negs=False)
    s1, m1 = step(state, dict(batches[0]))
    s1_0, m1_0 = step0(state0, dict(batches[0]))
    np.testing.assert_allclose(float(m1["loss"]), float(m1_0["loss"]),
                               rtol=1e-6)

    # FIFO: after 3 steps the cache holds batches 2 and 3 (in order)
    s2, m2 = step(s1, dict(batches[1]))
    s3, m3 = step(s2, dict(batches[2]))
    ids = np.asarray(s3.extras["ids"])
    np.testing.assert_array_equal(ids[:b], batches[1]["movie_id"])
    np.testing.assert_array_equal(ids[b:], batches[2]["movie_id"])
    assert np.all(np.asarray(s3.extras["corr"]) > -1e8)  # no empty slots
    assert np.isfinite(float(m3["loss"]))
    # with a warm cache the loss differs from the cacheless run (the
    # negatives actually participate)
    s2_0, m2_0 = step0(s1_0, dict(batches[1]))
    s3_0, m3_0 = step0(s2_0, dict(batches[2]))
    assert not np.isclose(float(m3["loss"]), float(m3_0["loss"]),
                          rtol=1e-6)


def test_cache_rejects_per_replica_scope_and_batch_multiple():
    b = 64
    cfg = RecsysConfig(
        model=_TINY,
        train=TrainConfig(batch_size=b, epochs=1, negative_cache=2 * b,
                          global_negatives=False),
        eval=EvalConfig(topk=(5,)),
    )
    ctx = make_mesh(model_parallel=1)
    tr = Trainer(cfg, output_dir="/tmp/negcache_pr", mesh_ctx=ctx)
    state = tr.init_state(40, 30, seed=0)
    tr._state_for_shape = state
    with pytest.raises(ValueError, match="per-replica"):
        tr.make_train_step(class_weights=(1.0, 1.0),
                           example_batch=_batch(b, 40, 30, 0),
                           use_explicit_negs=False)

    tr2, state2 = _make_trainer(cache=100)  # not a multiple of 64
    with pytest.raises(ValueError, match="multiple"):
        tr2.make_train_step(class_weights=(1.0, 1.0),
                            example_batch=_batch(64, 40, 30, 0),
                            use_explicit_negs=False)


@pytest.mark.parametrize("sparse", [False, True])
def test_cache_composes_with_spmd_a2a_step(sparse):
    """VERDICT r4 item 8: the cache now threads through the explicit
    psum/a2a SPMD step (row-sharded tables — the giant-catalog regime
    CBNS targets). Parity: the SPMD a2a step with a cache reproduces
    the GSPMD step's trajectory (losses and cache contents) over 3
    steps at global negatives."""
    from recsys_tpu.config import MeshConfig

    b = 64
    batches = [_batch(b, 40, 30, s) for s in range(3)]

    def run(model_parallel, lookup):
        cfg = RecsysConfig(
            model=_TINY,
            train=TrainConfig(batch_size=b, epochs=1, negative_cache=2 * b,
                              sparse_table_updates=sparse,
                              donate_state=False),
            mesh=MeshConfig(model_axis=model_parallel,
                            embedding_sharding="rows" if model_parallel > 1
                            else "replicated",
                            lookup_strategy=lookup),
            eval=EvalConfig(topk=(5,)),
        )
        ctx = make_mesh(model_parallel=model_parallel)
        tr = Trainer(cfg, output_dir=f"/tmp/negcache_spmd_{os.getpid()}",
                     mesh_ctx=ctx)
        state = tr.init_state(40, 30, seed=0)
        tr._state_for_shape = state
        step = tr.make_train_step(class_weights=(1.2, 0.9),
                                  example_batch=batches[0],
                                  use_explicit_negs=False)
        ms = []
        for bt in batches:
            state, m = step(state, dict(bt))
            ms.append(float(m["loss"]))
        return state, ms

    s_ref, losses_ref = run(1, "xla")       # GSPMD path
    s_spmd, losses_spmd = run(2, "a2a")     # explicit a2a SPMD path
    np.testing.assert_allclose(losses_spmd, losses_ref, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(s_spmd.extras["ids"]),
                                  np.asarray(s_ref.extras["ids"]))
    np.testing.assert_allclose(np.asarray(s_spmd.extras["corr"]),
                               np.asarray(s_ref.extras["corr"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_spmd.extras["emb"]),
                               np.asarray(s_ref.extras["emb"]),
                               rtol=2e-3, atol=1e-4)


def test_chunked_extra_candidates_matches_dense_reference():
    """The non-materializing chunked loss now accepts the cache
    (VERDICT r4 item 8's second leg): same math as the dense path,
    including when the cache pads to a non-chunk-multiple total."""
    d = _data(b=32, n_extra=24)
    want = _dense_reference(d["u"], d["v"], d["ids"], d["logq"], d["bias"],
                            d["x_emb"], d["x_ids"], d["x_corr"])
    got = float(losses.in_batch_softmax_chunked(
        d["u"], d["v"], item_ids=d["ids"], log_q=d["logq"],
        item_bias=d["bias"], chunk_size=16,
        extra_candidates=(d["x_emb"], d["x_ids"], d["x_corr"]),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # empty (-1e9 corr) slots are exact no-ops through the chunked path
    x_emb2 = jnp.concatenate([d["x_emb"],
                              jnp.ones((8, d["x_emb"].shape[1]))])
    x_ids2 = jnp.concatenate([d["x_ids"], jnp.full((8,), -1, jnp.int32)])
    x_corr2 = jnp.concatenate([d["x_corr"], jnp.full((8,), -1e9)])
    got2 = float(losses.in_batch_softmax_chunked(
        d["u"], d["v"], item_ids=d["ids"], log_q=d["logq"],
        item_bias=d["bias"], chunk_size=16,
        extra_candidates=(x_emb2, x_ids2, x_corr2),
    ))
    np.testing.assert_allclose(got2, want, rtol=1e-5)


def test_cache_survives_checkpoint_resume(tiny_bundle, tmp_path):
    """The cache (TrainState.extras) rides the Orbax checkpoint: a
    resumed run restores a WARM cache, not a cold one."""
    out = str(tmp_path / "resume_cache")
    cfg1 = RecsysConfig(
        model=_TINY,
        train=TrainConfig(batch_size=256, epochs=1, optimizer="adam",
                          learning_rate=5e-3, negative_cache=512,
                          log_every_steps=1),
        eval=EvalConfig(topk=(5,), eval_batch_size=256),
    )
    tr1 = Trainer(cfg1, output_dir=out)
    tr1.train(tiny_bundle)
    ids1 = np.asarray(tr1.final_state.extras["ids"])
    assert (ids1 >= 0).any()  # the cache warmed up during epoch 1

    cfg2 = dataclasses.replace(
        cfg1, train=dataclasses.replace(cfg1.train, epochs=2, resume=True))
    tr2 = Trainer(cfg2, output_dir=out)
    tr2.train(tiny_bundle)
    assert int(np.asarray(tr2.final_state.step)) > int(
        np.asarray(tr1.final_state.step))
    ids2 = np.asarray(tr2.final_state.extras["ids"])
    assert (ids2 >= 0).all()  # fully warm after the resumed epoch
