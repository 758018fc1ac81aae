"""Auxiliary coverage: EDA script, sharded checkpoint round-trip,
streaming (non-device-resident) trainer path, config round-trip."""

import json

import numpy as np
import pytest

from recsys_tpu.config import MeshConfig, RecsysConfig, TrainConfig


def test_eda_script(tmp_path):
    import sys

    sys.path.insert(0, "benchmarks")
    from benchmarks.eda import run_eda

    report = run_eda("/root/reference/data/raw", synthetic_ratings=5000)
    assert report["n_users"] > 0 and report["n_movies"] > 0
    assert 0.0 < report["sparsity"] < 1.0
    assert report["consistency"]["rating_users_missing_from_users_table"] == 0
    assert sum(report["genre_counts"].values()) > 0
    assert set(report["rating_distribution"]) <= {"1", "2", "3", "4", "5"}


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Checkpoint a rows-sharded TrainState and restore it with the
    same shardings (each shard's contents preserved)."""
    import jax

    from recsys_tpu.config import EvalConfig, ModelConfig
    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.train.checkpoint import CheckpointManager
    from recsys_tpu.train.trainer import Trainer, TrainState

    cfg = RecsysConfig(
        model=ModelConfig(embedding_dim=16, user_tower_dims=(16,),
                          item_tower_dims=(16,), cross_layers=1, dnn_dims=(8,),
                          dropout_rate=0.0, mixed_precision=False),
        mesh=MeshConfig(model_axis=4, embedding_sharding="rows"),
        train=TrainConfig(batch_size=64),
    )
    tr = Trainer(cfg, output_dir=str(tmp_path / "run"),
                 mesh_ctx=make_mesh(model_parallel=4))
    state = tr.init_state(50, 70, seed=0)
    mgr = CheckpointManager(str(tmp_path / "ckpts"), keep=2)
    mgr.save(5, state._asdict(), metrics={"val_loss": 1.0}, is_best=True)
    restored = mgr.restore(5, like=state._asdict())
    for a, b in zip(jax.tree.leaves(state._asdict()), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert mgr.best_step() == 5
    # rotation keeps best
    mgr.save(6, state._asdict())
    mgr.save(7, state._asdict())
    mgr.save(8, state._asdict())
    assert 5 in mgr.all_steps()


def test_streaming_trainer_path(tiny_bundle, tmp_path):
    """device_resident_data=False exercises the per-step transfer path."""
    from recsys_tpu.config import EvalConfig, ModelConfig
    from recsys_tpu.train.trainer import Trainer

    cfg = RecsysConfig(
        model=ModelConfig(embedding_dim=8, user_tower_dims=(16,),
                          item_tower_dims=(16,), cross_layers=1, dnn_dims=(8,),
                          dropout_rate=0.0, mixed_precision=False),
        train=TrainConfig(batch_size=256, epochs=1, optimizer="adam",
                          learning_rate=5e-3, device_resident_data=False,
                          log_every_steps=1),
        eval=EvalConfig(topk=(5,), eval_batch_size=256),
    )
    tr = Trainer(cfg, output_dir=str(tmp_path / "stream"))
    report = tr.train(tiny_bundle)
    assert np.isfinite(report["recall@5"])


def test_config_dotted_replace_and_roundtrip(tmp_path):
    cfg = RecsysConfig()
    cfg2 = cfg.replace(**{"train.epochs": 3, "model.embedding_dim": 64})
    assert cfg2.train.epochs == 3 and cfg2.model.embedding_dim == 64
    with pytest.raises(KeyError):
        cfg.replace(**{"train.nonexistent": 1})
    p = str(tmp_path / "c.json")
    cfg2.save(p)
    cfg3 = RecsysConfig.load(p)
    assert cfg3 == cfg2


def test_replication_checksum_clean_and_desynced():
    """utils/debug: per-device checksums agree for genuinely replicated
    state and detect a deliberately desynced replica (the TPU-native
    race-detection analogue, SURVEY §5.2)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.utils.debug import assert_replicated, per_device_checksums

    ctx = make_mesh(model_parallel=2)
    rep = NamedSharding(ctx.mesh, P())
    tree = {
        "w": jax.device_put(jnp.arange(32, dtype=jnp.float32), rep),
        "b": jax.device_put(jnp.ones((4, 8), jnp.float32), rep),
    }
    sums = assert_replicated(tree, ctx.mesh, ctx.data_axis)
    assert len(sums) == ctx.n_data * ctx.n_model
    assert np.allclose(sums, sums[0])

    # rows-sharded leaves are excluded (they legitimately differ)
    rows = NamedSharding(ctx.mesh, P(ctx.model_axis, None))
    tree["table"] = jax.device_put(
        jnp.arange(64, dtype=jnp.float32).reshape(8, 8), rows
    )
    assert_replicated(tree, ctx.mesh, ctx.data_axis)

    # deliberately desync one replica: same P() layout claim, different
    # buffer contents per device
    devs = list(ctx.mesh.devices.flat)
    host = np.ones((16,), np.float32)
    bufs = []
    for i, d in enumerate(devs):
        arr = host.copy()
        if i == len(devs) - 1:
            arr[0] += 0.5  # the "race"
        bufs.append(jax.device_put(arr, d))
    desynced = jax.make_array_from_single_device_arrays(
        (16,), rep, bufs
    )
    bad = {"w": desynced}
    with pytest.raises(RuntimeError, match="replica desync"):
        assert_replicated(bad, ctx.mesh, ctx.data_axis)

    # a SINGLE-element drift far below the fp32 magnitude tolerance
    # (sum |params| ~1e7 -> tol ~10; drift 1e-3) must still be caught —
    # the bit-exact XOR checksum has no absorption blind spot
    big = np.full((1_000_000,), 10.0, np.float32)
    bufs = []
    for i, d in enumerate(devs):
        arr = big.copy()
        if i == 0:
            arr[123] += 1e-3
        bufs.append(jax.device_put(arr, d))
    subtle = jax.make_array_from_single_device_arrays((1_000_000,), rep, bufs)
    with pytest.raises(RuntimeError, match="bit checksums"):
        assert_replicated({"w": subtle}, ctx.mesh, ctx.data_axis)


@pytest.mark.slow  # >40s: heavy SPMD/CLI lane (ROUND4 item 8)
def test_trainer_replication_check_runs(tiny_bundle, tmp_path):
    """TrainConfig.replication_check_every_epochs wires the checksum
    into the epoch loop and logs it."""
    import json as _json

    from recsys_tpu.config import EvalConfig, ModelConfig, RecsysConfig, TrainConfig
    from recsys_tpu.train.trainer import Trainer

    cfg = RecsysConfig(
        model=ModelConfig(embedding_dim=8, user_tower_dims=(16,),
                          item_tower_dims=(16,), cross_layers=1,
                          dnn_dims=(8,), dropout_rate=0.0,
                          mixed_precision=False),
        train=TrainConfig(batch_size=256, epochs=2, log_every_steps=1,
                          replication_check_every_epochs=1),
        eval=EvalConfig(topk=(5,), eval_batch_size=256),
    )
    tr = Trainer(cfg, output_dir=str(tmp_path / "repl"))
    tr.train(tiny_bundle)
    hist = _json.load(open(tmp_path / "repl" / "detailed_metrics.json"))["epochs"]
    assert "replica_checksum" in hist[0]
    assert np.isfinite(hist[0]["replica_checksum"])


def test_metric_writer_tensorboard_and_wandb_sinks(tmp_path, monkeypatch):
    """MetricWriter writes per-epoch TensorBoard scalars (the reference
    wires a TB callback per epoch, ``src/trainer.py:169``) and logs each
    epoch + the final report to the active W&B run
    (``src/trainer.py:173-174,218-219``)."""
    import sys
    import types

    from recsys_tpu.utils.metrics_io import MetricWriter

    logged = []
    fake_run = types.SimpleNamespace(
        log=lambda payload, step=None: logged.append((step, payload))
    )
    fake_wandb = types.ModuleType("wandb")
    fake_wandb.run = fake_run
    monkeypatch.setitem(sys.modules, "wandb", fake_wandb)

    w = MetricWriter(str(tmp_path))
    for epoch in range(3):
        w.start_epoch()
        w.end_epoch(epoch, {"train_loss": 1.0 / (epoch + 1), "val_loss": 2.0})
    w.write_final_metrics({"recall@10": 0.31, "ndcg@10": 0.2})
    w.close()

    # W&B saw one log per epoch with the epoch as the step, plus finals
    epoch_logs = [(s, p) for s, p in logged if s is not None]
    assert [s for s, _ in epoch_logs] == [0, 1, 2]
    assert all("train_loss" in p for _, p in epoch_logs)
    final_logs = [p for s, p in logged if s is None]
    assert final_logs and "final/recall@10" in final_logs[0]

    # TB event files exist and contain the scalar tags
    tb_dir = tmp_path / "tensorboard"
    events = list(tb_dir.glob("events.out.tfevents.*"))
    assert events, "no TensorBoard event file written"
    # crude content check: the tag bytes appear in the event stream
    blob = b"".join(p.read_bytes() for p in events)
    assert b"train_loss" in blob and b"val_loss" in blob


def test_readme_numbers_match_committed_results():
    """Front-page drift guard (VERDICT r3 item 5): every headline
    number in README.md must match the committed results JSON it
    cites. The claim list lives in benchmarks/check_docs.py."""
    import benchmarks.check_docs as cd

    failures = cd.check_readme()
    assert not failures, "\n".join(failures)


def test_npz_checkpoint_roundtrips_none_extras(tmp_path):
    """TrainState.extras=None (negative cache off) must survive the
    npz fallback checkpoint path: np.asarray(None) is an object array
    np.load refuses (allow_pickle=False) — the flattener skips None
    leaves and restore rebuilds the field from the NamedTuple default."""
    import jax
    import jax.numpy as jnp

    from recsys_tpu.train.checkpoint import CheckpointManager
    from recsys_tpu.train.trainer import TrainState

    st = TrainState({"w": jnp.ones((2, 2))},
                    {"accum": {"w": jnp.zeros((2, 2))}},
                    jnp.zeros((), jnp.int32), jax.random.PRNGKey(0), None)
    cm = CheckpointManager(str(tmp_path / "ck"), keep=1, use_orbax=False)
    cm.save(3, st._asdict())
    s, tree = cm.restore_latest()
    st2 = TrainState(**tree)
    assert s == 3 and st2.extras is None
    np.testing.assert_array_equal(np.asarray(st2.params["w"]),
                                  np.ones((2, 2)))


@pytest.mark.slow
def test_scale_bench_efficiency_mode_smoke():
    """The one-command scaling-efficiency harness (VERDICT r4 item 7)
    runs end-to-end on the CPU mesh and emits the contract fields; the
    committed row is labeled functional_only off-TPU."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "benchmarks"))
    from scale_bench import bench_efficiency

    res = bench_efficiency(n_devices=2, dim=8, batch_per_dev=64, reps=2,
                           n_users=1000, n_items=200)
    assert res["mode"] == "efficiency"
    assert res["functional_only"] is True  # CPU mesh in the suite
    assert 0.0 < res["scaling_efficiency"]
    assert res["examples_per_s_1dev"] > 0
    assert res["examples_per_s_2dev"] > 0
    assert isinstance(res["meets_north_star"], bool)
    assert res["north_star"] == 0.80


@pytest.mark.slow
def test_scale_bench_a2a_overhead_mode_smoke():
    """The single-chip a2a-bucketing-cost bench (VERDICT r4 weak #5)
    runs on a degenerate 1-device mesh and emits the machinery deltas;
    on the committed TPU row the deltas anchor DESIGN §3.1's crossover
    constant."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "benchmarks"))
    from scale_bench import bench_a2a_overhead

    res = bench_a2a_overhead(rows=512, dim=8, batch=64, reps=3)
    assert res["mode"] == "a2a_overhead"
    for k in ("plain_ms", "psum_ms", "a2a_ms_cap1_0", "a2a_ms_cap2_0",
              "plain_fwdbwd_ms", "a2a_fwdbwd_ms"):
        assert res[k] > 0, k
    assert "a2a_machinery_us" in res and "a2a_machinery_fwdbwd_us" in res
