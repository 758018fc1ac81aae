"""End-to-end trainer tests on the 8-device CPU mesh: the minimum
end-to-end slice of SURVEY §7.2 plus sharded-table and resume paths."""

import dataclasses
import json
import os

import numpy as np
import pytest

from recsys_tpu.config import (
    DataConfig,
    EvalConfig,
    MeshConfig,
    ModelConfig,
    RecsysConfig,
    TrainConfig,
)
from recsys_tpu.parallel.mesh import make_mesh
from recsys_tpu.train.trainer import Trainer

TINY_MODEL = ModelConfig(
    embedding_dim=16,
    user_tower_dims=(32,),
    item_tower_dims=(32,),
    cross_layers=2,
    dnn_dims=(16,),
    dropout_rate=0.0,
    mixed_precision=False,
)


def _cfg(**train_kw):
    kw = dict(
        batch_size=256, epochs=8, learning_rate=5e-3, optimizer="adam",
        lr_decay_steps=10000, log_every_steps=1, early_stop_patience=20,
    )
    kw.update(train_kw)
    return RecsysConfig(
        model=TINY_MODEL,
        train=TrainConfig(**kw),
        eval=EvalConfig(topk=(5, 10), eval_batch_size=256,
                        filter_seen=True, score_norm="dot"),
    )


def test_end_to_end_training_improves(tiny_bundle, tmp_path):
    cfg = _cfg()
    tr = Trainer(cfg, output_dir=str(tmp_path / "run"))
    report = tr.train(tiny_bundle)
    # learned retrieval beats random (random recall@10 = 10/n_items = 2.5%;
    # popularity baseline on this fixture ~= 4.4%)
    n_items = int(tiny_bundle["meta/n_movies"])
    assert report["recall@10"] > 1.5 * 10 / n_items
    assert np.isfinite(report["rating_rmse"])
    assert "ctr_auc" in report and 0.0 <= report["ctr_auc"] <= 1.0
    # artifact contract
    out = tmp_path / "run"
    for artifact in ("training_log.csv", "detailed_metrics.json",
                     "metrics.json", "config.json"):
        assert (out / artifact).exists(), artifact
    for artifact in ("encoder.npz", "vocabs.json", "config.json", "index.npz"):
        assert (out / "serving" / artifact).exists(), artifact
    # training loss decreased epoch over epoch
    hist = json.load(open(out / "detailed_metrics.json"))["epochs"]
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    # vocabs contract parity
    vocabs = json.load(open(out / "serving" / "vocabs.json"))
    assert len(vocabs["users"]) == int(tiny_bundle["meta/n_users"])
    assert len(vocabs["items"]) == n_items


@pytest.mark.slow  # >40s: heavy SPMD/CLI lane (ROUND4 item 8)
def test_sharded_embedding_training_matches_replicated(tiny_bundle, tmp_path):
    """rows-sharded tables (model_parallel=4) must produce the same
    training trajectory as replicated (same seed, same batches)."""
    cfg_rep = _cfg()
    cfg_sh = cfg_rep.replace(
        mesh=MeshConfig(model_axis=4, embedding_sharding="rows")
    )
    tr_rep = Trainer(cfg_rep, output_dir=str(tmp_path / "rep"))
    rep_report = tr_rep.train(tiny_bundle)
    tr_sh = Trainer(cfg_sh, output_dir=str(tmp_path / "sh"),
                    mesh_ctx=make_mesh(model_parallel=4))
    sh_report = tr_sh.train(tiny_bundle)
    assert abs(rep_report["recall@10"] - sh_report["recall@10"]) < 0.15
    h_rep = json.load(open(tmp_path / "rep" / "detailed_metrics.json"))["epochs"]
    h_sh = json.load(open(tmp_path / "sh" / "detailed_metrics.json"))["epochs"]
    np.testing.assert_allclose(
        h_rep[0]["train_loss"], h_sh[0]["train_loss"], rtol=1e-3
    )


def test_explicit_negatives_path_trains(tiny_bundle, tmp_path):
    # dropout > 0 on purpose: regression for the dropout-PRNG-key path
    # through the negative-item tower
    cfg = _cfg().replace(
        model=dataclasses.replace(TINY_MODEL, dropout_rate=0.2),
        data=DataConfig(negative_sampling="mixed", num_hard_negatives=2,
                        num_random_negatives=3),
        **{"train.epochs": 1},
    )
    tr = Trainer(cfg, output_dir=str(tmp_path / "negs"))
    report = tr.train(tiny_bundle)
    assert np.isfinite(report["recall@10"])


def test_resume_from_checkpoint(tiny_bundle, tmp_path):
    out = str(tmp_path / "resume")
    cfg1 = _cfg(epochs=1)
    tr1 = Trainer(cfg1, output_dir=out)
    tr1.train(tiny_bundle)
    step_after_1 = int(np.asarray(tr1.final_state.step))
    assert step_after_1 > 0

    cfg2 = _cfg(epochs=2, resume=True)
    tr2 = Trainer(cfg2, output_dir=out)
    tr2.train(tiny_bundle)
    step_after_2 = int(np.asarray(tr2.final_state.step))
    assert step_after_2 > step_after_1
    # resumed run did not restart from step 0
    assert step_after_2 <= 2 * step_after_1


def test_sparse_table_updates_match_dense():
    """The sparse-embedding-update step (touched-rows-only adagrad,
    trainer._step_core_sparse) must be numerically equivalent to the
    dense step — including duplicate ids in a batch (scatter-add
    combine), global-norm clipping, and the LR schedule."""
    import jax
    import jax.numpy as jnp

    n_users, n_items, b = 40, 30, 64
    rng = np.random.default_rng(0)
    batch = {
        # heavy duplication to stress the combine path
        "user_id": rng.integers(0, 8, b).astype(np.int32),
        "movie_id": rng.integers(0, 6, b).astype(np.int32),
        "rating": rng.uniform(1, 5, b).astype(np.float32),
        "y_implicit": (rng.random(b) > 0.5).astype(np.float32),
        "log_q": rng.normal(size=b).astype(np.float32),
    }

    def run(sparse: bool):
        cfg = RecsysConfig(
            model=TINY_MODEL,
            train=TrainConfig(
                batch_size=b, epochs=1, optimizer="adagrad",
                learning_rate=0.05, clipnorm=1.0, warmup_steps=2,
                sparse_table_updates=sparse, donate_state=False,
            ),
            eval=EvalConfig(topk=(5,)),
        )
        ctx = make_mesh(model_parallel=1)
        tr = Trainer(cfg, output_dir="/tmp/sparse_eq_" + str(os.getpid()), mesh_ctx=ctx)
        state = tr.init_state(n_users, n_items, seed=0)
        tr._state_for_shape = state
        step = jax.jit(tr._step_core((1.2, 0.9), False))
        for _ in range(5):
            state, metrics = step(state, dict(batch))
        return jax.device_get(state.params), float(metrics["loss"])

    p_dense, l_dense = run(False)
    p_sparse, l_sparse = run(True)
    assert np.isclose(l_dense, l_sparse, rtol=1e-5), (l_dense, l_sparse)
    flat_d = jax.tree_util.tree_flatten_with_path(p_dense)[0]
    flat_s = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(p_sparse)[0]}
    for k, vd in flat_d:
        vs = flat_s[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            vd, vs, rtol=2e-5, atol=2e-6, err_msg=jax.tree_util.keystr(k)
        )


def test_sparse_table_updates_sharded_rows():
    """Sparse updates compose with row-sharded tables on the mesh."""
    import jax

    n_users, n_items, b = 64, 48, 32
    rng = np.random.default_rng(1)
    batch = {
        "user_id": rng.integers(0, n_users, b).astype(np.int32),
        "movie_id": rng.integers(0, n_items, b).astype(np.int32),
        "rating": rng.uniform(1, 5, b).astype(np.float32),
        "y_implicit": (rng.random(b) > 0.5).astype(np.float32),
        "log_q": rng.normal(size=b).astype(np.float32),
    }
    cfg = RecsysConfig(
        model=TINY_MODEL,
        mesh=MeshConfig(model_axis=2, embedding_sharding="rows"),
        train=TrainConfig(
            batch_size=b, epochs=1, optimizer="adagrad",
            sparse_table_updates=True, donate_state=False,
        ),
        eval=EvalConfig(topk=(5,)),
    )
    ctx = make_mesh(model_parallel=2)
    tr = Trainer(cfg, output_dir="/tmp/sparse_sh_" + str(os.getpid()), mesh_ctx=ctx)
    state = tr.init_state(n_users, n_items, seed=0)
    tr._state_for_shape = state
    step = tr.make_train_step((1.0, 1.0), batch, False)
    from recsys_tpu.parallel.sharding import shard_batch

    placed = shard_batch(ctx, batch)
    losses = []
    for _ in range(4):
        state, metrics = step(state, placed)
        losses.append(float(np.asarray(metrics["loss"])))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_dense_features_training(tiny_bundle, tmp_path):
    """ModelConfig.dense_features: engineered features reach the DCN
    ranking input (the capability the reference computes but never
    uses, SURVEY §7.3); bundle ships features.npz for serving."""
    from recsys_tpu.data.features import FeatureEngineer

    f = FeatureEngineer.n_features(with_genres=True)
    cfg = _cfg(epochs=4)
    cfg = cfg.replace(model=dataclasses.replace(TINY_MODEL, dense_features=f))
    tr = Trainer(cfg, output_dir=str(tmp_path / "dense"))
    report = tr.train(tiny_bundle)
    assert np.isfinite(report["rating_rmse"])
    # temporal-extrapolation clip must keep the eval-path heads sane
    # (unclipped, val features reach ~70 train-σ and the cross term
    # blows the rating head to RMSE > 15)
    assert report["rating_rmse"] < 2.5
    assert 0.0 <= report["ctr_auc"] <= 1.0
    assert (tmp_path / "dense" / "serving" / "features.npz").exists()
    # feature-engineer state round-trips through the bundle
    from recsys_tpu.train.checkpoint import load_feature_engineer

    eng = load_feature_engineer(str(tmp_path / "dense" / "serving"))
    assert eng is not None and eng.fitted
    uid = tiny_bundle["val/user_id"][:64]
    mid = tiny_bundle["val/movie_id"][:64]
    ts = tiny_bundle["val/timestamp"][:64].astype(np.float64)
    ref = tr._feature_engineer.transform_scaled(uid, mid, ts)
    np.testing.assert_allclose(eng.transform_scaled(uid, mid, ts), ref,
                               rtol=1e-6)


def test_dense_features_streaming_path(tiny_bundle, tmp_path):
    """Dense features must also flow through the streaming (non
    device-resident) batcher path."""
    from recsys_tpu.data.features import FeatureEngineer

    f = FeatureEngineer.n_features(with_genres=True)
    cfg = _cfg(epochs=2, device_resident_data=False)
    cfg = cfg.replace(model=dataclasses.replace(TINY_MODEL, dense_features=f))
    tr = Trainer(cfg, output_dir=str(tmp_path / "dense_stream"))
    report = tr.train(tiny_bundle)
    assert np.isfinite(report["rating_rmse"])


def test_stream_chunk_parity(tiny_bundle, tmp_path):
    """``stream_chunk_steps`` coalesces transfers only: the K-step scan
    must reproduce the per-step streaming trajectory (same seed, same
    batch order, same per-step math). Chunk 5 over ~12 steps/epoch also
    exercises the per-step tail path after two full chunks."""
    import jax

    cfg1 = _cfg(epochs=2, device_resident_data=False, stream_chunk_steps=1)
    tr1 = Trainer(cfg1, output_dir=str(tmp_path / "per_step"))
    rep1 = tr1.train(tiny_bundle)
    cfg2 = _cfg(epochs=2, device_resident_data=False, stream_chunk_steps=5)
    tr2 = Trainer(cfg2, output_dir=str(tmp_path / "chunked"))
    rep2 = tr2.train(tiny_bundle)
    p1 = jax.device_get(tr1.final_state.params)
    p2 = jax.device_get(tr2.final_state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5),
        p1, p2,
    )
    assert int(np.asarray(tr2.final_state.step)) == int(
        np.asarray(tr1.final_state.step))
    assert abs(rep1["recall@10"] - rep2["recall@10"]) < 0.02


def test_softmax_temperature_trains(tiny_bundle, tmp_path):
    cfg = _cfg(epochs=2)
    cfg = cfg.replace(
        model=dataclasses.replace(TINY_MODEL, softmax_temperature=0.3)
    )
    tr = Trainer(cfg, output_dir=str(tmp_path / "temp"))
    report = tr.train(tiny_bundle)
    assert np.isfinite(report["recall@10"])


def test_preemption_checkpoint_and_resume(tiny_bundle, tmp_path):
    """SIGTERM mid-training -> finish the epoch, checkpoint, return a
    preempted report; a --resume run continues from that step
    (SURVEY §5.3 — graceful preemption, absent upstream)."""
    import os
    import signal

    out = str(tmp_path / "preempt")
    cfg = _cfg(epochs=5, log_every_steps=1)
    tr = Trainer(cfg, output_dir=out)

    # deliver SIGTERM from inside the first epoch (the trainer's
    # handlers are installed right before the epoch loop, so hooking
    # start_epoch makes the delivery race-free); the handler defers the
    # stop to the end of the running epoch
    orig_start = tr.writer.start_epoch
    fired = {"n": 0}

    def start_and_signal():
        fired["n"] += 1
        if fired["n"] == 1:
            os.kill(os.getpid(), signal.SIGTERM)
        return orig_start()

    tr.writer.start_epoch = start_and_signal
    report = tr.train(tiny_bundle)
    assert report.get("preempted") is True
    assert report["epochs_run"] < 5
    step_at_preempt = report["resume_step"]
    assert step_at_preempt > 0
    # handlers restored
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler,
    ) or callable(signal.getsignal(signal.SIGTERM))

    cfg2 = _cfg(epochs=2, resume=True)
    tr2 = Trainer(cfg2, output_dir=out)
    rep2 = tr2.train(tiny_bundle)
    assert rep2.get("preempted") is None
    assert int(np.asarray(tr2.final_state.step)) >= step_at_preempt


def test_ranking_lr_split():
    """``learning_rate_ranking`` drives a separate LR for the ranking
    stack (DCN + heads) while the retrieval side keeps the base LR —
    the split the reference declares (src/config.py:28-29) but never
    wires. Default None = single LR (the behavior the reference ran)."""
    import jax
    import jax.numpy as jnp

    from recsys_tpu.config import TrainConfig
    from recsys_tpu.train.optimizer import make_optimizer, ranking_lr_scale

    assert ranking_lr_scale(TrainConfig()) is None  # default: off

    cfg = TrainConfig(learning_rate=1e-3, learning_rate_ranking=1e-4,
                      clipnorm=0.0, warmup_steps=0)
    opt = make_optimizer(cfg)
    params = {
        "towers": {"user_table": jnp.ones((4, 2))},
        "dcn": {"w": jnp.ones((3,))},
        "rating_head": {"w": jnp.ones((3,))},
        "ctr_head": {"b": jnp.ones(())},
    }
    grads = jax.tree.map(jnp.ones_like, params)
    state = opt.init(params)
    new_params, _ = opt.update(grads, state, params, jnp.zeros((), jnp.int32))
    d_retr = float((params["towers"]["user_table"] - new_params["towers"]["user_table"])[0, 0])
    d_rank = float((params["dcn"]["w"] - new_params["dcn"]["w"])[0])
    # adagrad delta = lr*s*g/(sqrt(acc)+eps): the ratio of deltas IS the split
    assert abs(d_rank / d_retr - 0.1) < 1e-3
    d_head = float((params["rating_head"]["w"] - new_params["rating_head"]["w"])[0])
    assert abs(d_head / d_retr - 0.1) < 1e-3


def test_checkpoint_every_steps_streaming(tiny_bundle, tmp_path):
    """``checkpoint_every_steps`` produces mid-epoch checkpoints on the
    streaming data path (long-epoch safety against preemption)."""
    from recsys_tpu.config import EvalConfig, ModelConfig, RecsysConfig, TrainConfig
    from recsys_tpu.train.trainer import Trainer

    cfg = RecsysConfig(
        model=ModelConfig(embedding_dim=8, user_tower_dims=(16,),
                          item_tower_dims=(16,), cross_layers=1,
                          dnn_dims=(8,), dropout_rate=0.0,
                          mixed_precision=False),
        train=TrainConfig(batch_size=256, epochs=1,
                          device_resident_data=False,
                          checkpoint_every_steps=3,
                          keep_checkpoints=100),
        eval=EvalConfig(topk=(5,), eval_batch_size=256),
    )
    tr = Trainer(cfg, output_dir=str(tmp_path))
    tr.train(tiny_bundle)
    steps = tr.ckpt.all_steps()
    # tiny_bundle train split ~3200 rows -> ~12 steps/epoch: cadence-3
    # mid-epoch saves (3, 6, 9, 12) plus the end-of-epoch save
    assert len(steps) >= 3, steps
    assert any(s % 3 == 0 and s not in (0,) for s in steps)


def test_sparse_lazy_adam_unit_semantics():
    """sparse_lazy_adam_combined: touched rows follow Adam with
    global-step bias correction; untouched rows (params AND moments)
    are bit-identical — the lazy contract."""
    import jax.numpy as jnp

    from recsys_tpu.train import optimizer as opt_lib

    rng = np.random.default_rng(0)
    V, D, B = 20, 4, 8
    table = rng.normal(size=(V, D)).astype(np.float32)
    mu = rng.normal(size=(V, D)).astype(np.float32) * 0.1
    nu = np.abs(rng.normal(size=(V, D))).astype(np.float32) * 0.01
    ids = np.array([3, 3, 7, 1, 1, 1, 9, 7], np.int32)  # duplicates
    grads = rng.normal(size=(B, D)).astype(np.float32)
    lr, step, b1, b2, eps = 0.01, 4, 0.9, 0.999, 1e-8

    slot, comb, valid = opt_lib.combine_duplicate_rows(
        jnp.asarray(ids), jnp.asarray(grads))
    t_new, mu_new, nu_new = opt_lib.sparse_lazy_adam_combined(
        jnp.asarray(table), jnp.asarray(mu), jnp.asarray(nu),
        slot, comb, valid, jnp.float32(lr), jnp.int32(step),
        b1=b1, b2=b2, eps=eps)
    t_new, mu_new, nu_new = map(np.asarray, (t_new, mu_new, nu_new))

    touched = np.unique(ids)
    untouched = np.setdiff1d(np.arange(V), touched)
    # lazy: untouched rows move NOTHING — not even a moment decay
    assert np.array_equal(t_new[untouched], table[untouched])
    assert np.array_equal(mu_new[untouched], mu[untouched])
    assert np.array_equal(nu_new[untouched], nu[untouched])

    # touched rows: reference NumPy lazy-adam with summed duplicates
    dense_g = np.zeros((V, D), np.float32)
    np.add.at(dense_g, ids, grads)
    t = step + 1.0
    for r in touched:
        m = b1 * mu[r] + (1 - b1) * dense_g[r]
        v = b2 * nu[r] + (1 - b2) * dense_g[r] ** 2
        want = table[r] - lr * (m / (1 - b1 ** t)) / (
            np.sqrt(v / (1 - b2 ** t)) + eps)
        np.testing.assert_allclose(t_new[r], want, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(mu_new[r], m, rtol=1e-6)
        np.testing.assert_allclose(nu_new[r], v, rtol=1e-6)


def test_sparse_updates_with_adam_train_and_stay_lazy():
    """The flagship Adam recipe now composes with sparse table updates
    (round 4): the sparse-adam step trains (loss drops), dense leaves
    match the dense-adam step exactly, and rows no batch ever touches
    stay bit-identical (lazy) while dense adam would move them."""
    import jax
    import jax.numpy as jnp

    n_users, n_items, b = 40, 30, 64
    rng = np.random.default_rng(1)
    batch = {
        # only ids < 8 / < 6 appear: rows above are never touched
        "user_id": rng.integers(0, 8, b).astype(np.int32),
        "movie_id": rng.integers(0, 6, b).astype(np.int32),
        "rating": rng.uniform(1, 5, b).astype(np.float32),
        "y_implicit": (rng.random(b) > 0.5).astype(np.float32),
        "log_q": rng.normal(size=b).astype(np.float32),
    }

    def run(sparse: bool, steps=5):
        cfg = RecsysConfig(
            model=TINY_MODEL,
            train=TrainConfig(
                batch_size=b, epochs=1, optimizer="adam",
                learning_rate=0.01, clipnorm=1.0,
                sparse_table_updates=sparse, donate_state=False,
            ),
            eval=EvalConfig(topk=(5,)),
        )
        ctx = make_mesh(model_parallel=1)
        tr = Trainer(cfg, output_dir="/tmp/lazy_adam_" + str(os.getpid()),
                     mesh_ctx=ctx)
        state = tr.init_state(n_users, n_items, seed=0)
        tr._state_for_shape = state
        step = jax.jit(tr._step_core((1.2, 0.9), False))
        losses = []
        for _ in range(steps):
            state, metrics = step(state, dict(batch))
            losses.append(float(metrics["loss"]))
        return jax.device_get(state.params), losses

    p0_tw = None
    p_sparse, l_sparse = run(True)
    p_dense, l_dense = run(False)

    # it trains
    assert l_sparse[-1] < l_sparse[0]
    # losses match the dense-adam run closely at step 1 (identical
    # params at that point: same fwd), then may drift (lazy semantics)
    assert np.isclose(l_sparse[0], l_dense[0], rtol=1e-5)

    # dense (non-table) leaves are updated by the same adam math
    for k in ("dcn", "rating_head", "ctr_head"):
        if k in p_sparse:
            for a, d in zip(jax.tree.leaves(p_sparse[k]),
                            jax.tree.leaves(p_dense[k])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(d),
                                           rtol=1e-4, atol=1e-5)

    # untouched table rows never move under lazy adam
    import dataclasses as _dc

    cfg = RecsysConfig(model=TINY_MODEL,
                       train=TrainConfig(batch_size=b, epochs=1,
                                         optimizer="adam"),
                       eval=EvalConfig(topk=(5,)))
    ctx = make_mesh(model_parallel=1)
    tr = Trainer(cfg, output_dir="/tmp/lazy_adam_init", mesh_ctx=ctx)
    p_init = jax.device_get(tr.init_state(n_users, n_items, seed=0).params)
    assert np.array_equal(
        np.asarray(p_sparse["towers"]["user_table"])[10:],
        np.asarray(p_init["towers"]["user_table"])[10:])
