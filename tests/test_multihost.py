"""Real multi-PROCESS training: two OS processes, each with two forced
CPU devices, joined by ``jax.distributed.initialize`` into one 4-device
data-parallel mesh with Gloo collectives (SURVEY §5.8's multi-host path,
exercised for real rather than simulated on one process).

Covers the pieces only a genuine multi-process run touches:
``maybe_initialize_distributed`` (env-driven), per-host Batcher slicing,
``make_array_from_process_local_data`` batch assembly, cross-process
gradient all-reduce, process-0-only artifact writing, and the
multi-host Orbax checkpoint coordination.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


TRAIN_ARGS = [
    "--embedding_dim", "8", "--batch_size", "128", "--epochs", "2",
    "--learning_rate", "0.05", "--no-bf16", "--seed", "11",
    # both runs must take the same data path for loss comparability:
    # multi-process forces streaming anyway (process-local arrays can't
    # feed a global-mesh jit), and the device-resident path uses a
    # different shuffle stream; log every step so train_loss is the
    # full-epoch mean, not the log_every_steps sample
    "--set", "train.device_resident_data=false",
    "--set", "train.log_every_steps=1",
    "--eval_sample", "500",  # keep the final eval cheap on CPU
]


def _run_training(bundle, out_dir, n_procs, port=None, timeout=420,
                  extra_args=()):
    """Launch scripts/train.py as ``n_procs`` coordinated processes."""
    procs = []
    for pid in range(n_procs):
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES",
                            "JAX_COORDINATOR_ADDRESS", "JAX_PROCESS_ID")}
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        # the coordinator env is set even for the 1-process reference
        # run: the container pre-initializes an accelerator backend at
        # import time and only maybe_initialize_distributed's
        # clear-backends path re-selects the CPU platform
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(n_procs)
        env["JAX_PROCESS_ID"] = str(pid)
        if n_procs == 1:
            # reference run on the SAME 4-device layout, one process
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts", "train.py"),
             "--data", bundle, "--output_dir", out_dir, *TRAIN_ARGS,
             *extra_args],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return [p.returncode for p in procs], outs


@pytest.mark.slow
def test_two_process_training_end_to_end(tiny_raw, tmp_path):
    from recsys_tpu.data.preprocessing import preprocessing_pipeline, save_bundle

    bundle_path = str(tmp_path / "mh.npz")
    save_bundle(preprocessing_pipeline(
        tiny_raw["ratings"], tiny_raw["movies"], tiny_raw["users"]
    ), bundle_path)

    out_mh = str(tmp_path / "multihost")
    rcs, outs = _run_training(bundle_path, out_mh, n_procs=2,
                              port=_free_port())
    assert rcs == [0, 0], "\n".join(o[-3000:] for o in outs)
    metrics = json.load(open(os.path.join(out_mh, "metrics.json")))
    assert np.isfinite(metrics["recall@10"])
    assert np.isfinite(metrics["rating_rmse"])
    # only process 0 writes artifacts; the bundle must be servable
    assert os.path.exists(os.path.join(out_mh, "serving", "index.npz"))
    # per-epoch history exists with 2 epochs
    hist = json.load(open(os.path.join(out_mh, "detailed_metrics.json")))
    assert len(hist["epochs"]) == 2

    # quality-parity with a single-process run on the same 4-device
    # layout, same seed: the per-host Batcher slices must reassemble the
    # SAME global batches, so the losses match closely (gloo vs local
    # all-reduce order is the only fp difference)
    out_sp = str(tmp_path / "singleproc")
    rcs_sp, outs_sp = _run_training(bundle_path, out_sp, n_procs=1,
                                    port=_free_port())
    assert rcs_sp == [0], outs_sp[0][-3000:]
    hist_sp = json.load(open(os.path.join(out_sp, "detailed_metrics.json")))
    for e_mh, e_sp in zip(hist["epochs"], hist_sp["epochs"]):
        assert abs(e_mh["train_loss"] - e_sp["train_loss"]) < 5e-3, (
            e_mh, e_sp)
        assert abs(e_mh["val_loss"] - e_sp["val_loss"]) < 5e-3


@pytest.mark.slow
def test_two_process_model_parallel_a2a(tiny_raw, tmp_path):
    """The flagship multi-chip layout across REAL process boundaries:
    two processes, four devices, mesh data=2 x model=2 with row-sharded
    tables read through the a2a exchange inside the gradient step — the
    all-to-alls and the sharded-table optimizer run over Gloo between
    processes. Loss parity vs the same config in one process."""
    from recsys_tpu.data.preprocessing import preprocessing_pipeline, save_bundle

    bundle_path = str(tmp_path / "mp.npz")
    save_bundle(preprocessing_pipeline(
        tiny_raw["ratings"], tiny_raw["movies"], tiny_raw["users"]
    ), bundle_path)
    extra = ["--model_parallel", "2", "--embedding_sharding", "rows",
             "--lookup_strategy", "a2a"]

    out_mh = str(tmp_path / "mp_multihost")
    rcs, outs = _run_training(bundle_path, out_mh, n_procs=2,
                              port=_free_port(), extra_args=extra)
    assert rcs == [0, 0], "\n".join(o[-3000:] for o in outs)
    hist = json.load(open(os.path.join(out_mh, "detailed_metrics.json")))
    assert len(hist["epochs"]) == 2
    assert os.path.exists(os.path.join(out_mh, "serving", "index.npz"))

    out_sp = str(tmp_path / "mp_singleproc")
    rcs_sp, outs_sp = _run_training(bundle_path, out_sp, n_procs=1,
                                    port=_free_port(), extra_args=extra)
    assert rcs_sp == [0], outs_sp[0][-3000:]
    hist_sp = json.load(open(os.path.join(out_sp, "detailed_metrics.json")))
    for e_mh, e_sp in zip(hist["epochs"], hist_sp["epochs"]):
        assert abs(e_mh["train_loss"] - e_sp["train_loss"]) < 5e-3, (
            e_mh, e_sp)


@pytest.mark.slow
def test_two_process_sharded_serving(tiny_raw, tmp_path):
    """The multi-chip FAISS replacement across REAL process boundaries
    (VERDICT r2 item 6): catalog row-sharded over a 2-process x 4-device
    mesh, ``/recommend`` answered over real HTTP through
    ``backend="sharded"`` (per-shard top-k + cross-process merge over
    Gloo, request uids relayed with broadcast_one_to_all), answers
    identical to a single-process service on the same bundle."""
    from recsys_tpu.config import (
        EvalConfig, ModelConfig, RecsysConfig, TrainConfig,
    )
    from recsys_tpu.data.preprocessing import preprocessing_pipeline
    from recsys_tpu.serve.service import RecommendationService
    from recsys_tpu.train.trainer import Trainer

    bundle = preprocessing_pipeline(
        tiny_raw["ratings"], tiny_raw["movies"], tiny_raw["users"])
    out = str(tmp_path / "model")
    cfg = RecsysConfig(
        model=ModelConfig(embedding_dim=8, user_tower_dims=(16,),
                          item_tower_dims=(16,), cross_layers=1,
                          dnn_dims=(8,), dropout_rate=0.0,
                          mixed_precision=False),
        train=TrainConfig(batch_size=128, epochs=1, log_every_steps=10),
        eval=EvalConfig(topk=(5,), eval_batch_size=256),
    )
    Trainer(cfg, output_dir=out).train(bundle)
    model_dir = os.path.join(out, "serving")

    ref = RecommendationService(model_dir, backend="device").load()
    uids = list(ref.user_id_map.keys())[:6]
    expected = {str(u): [r["item_id"] for r in ref.recommend(u, 5)]
                for u in uids}
    expected_scores = {str(u): [r["score"] for r in ref.recommend(u, 5)]
                       for u in uids}

    port = _free_port()
    out_json = str(tmp_path / "sharded_answers.json")
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES",
                            "JAX_COORDINATOR_ADDRESS", "JAX_PROCESS_ID")}
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "tests", "sharded_serve_worker.py"),
             model_dir, out_json, json.dumps([int(u) for u in uids])],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o)
    assert [p.returncode for p in procs] == [0, 0], \
        "\n".join(o[-3000:] for o in outs)
    got = json.load(open(out_json))
    for u in map(str, uids):
        ids = [r["item_id"] for r in got[u]["recommendations"]]
        assert ids == expected[u], (u, ids, expected[u])
        np.testing.assert_allclose(
            [r["score"] for r in got[u]["recommendations"]],
            expected_scores[u], rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_two_process_checkpoint_resume(tiny_raw, tmp_path):
    """Multi-host checkpoint/resume audit (VERDICT r4 item 4): a
    2-process run saves through the multi-host checkpoint path
    (cooperative Orbax save / synced npz fallback), a second 2-process
    ``--resume`` run restores and continues, and the resumed epoch-2
    trajectory matches an uninterrupted 2-process 2-epoch control run
    (same seed -> same global batches, so the losses only line up if
    BOTH processes restored the exact saved state). The resumed run
    also checksums nominally-replicated params across devices every
    epoch (replication_check), so cross-process state divergence after
    restore fails loudly in-run."""
    from recsys_tpu.data.preprocessing import preprocessing_pipeline, save_bundle

    bundle_path = str(tmp_path / "ck.npz")
    save_bundle(preprocessing_pipeline(
        tiny_raw["ratings"], tiny_raw["movies"], tiny_raw["users"]
    ), bundle_path)

    # leg 1: one epoch across two processes -> end-of-epoch checkpoint
    out = str(tmp_path / "resume_run")
    rcs, outs = _run_training(bundle_path, out, n_procs=2,
                              port=_free_port(),
                              extra_args=["--epochs", "1"])
    assert rcs == [0, 0], "\n".join(o[-3000:] for o in outs)
    ckpt_dir = os.path.join(out, "checkpoints")
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

    # leg 2: resume to 2 epochs (same output_dir)
    rcs2, outs2 = _run_training(
        bundle_path, out, n_procs=2, port=_free_port(),
        extra_args=["--resume",
                    "--set", "train.replication_check_every_epochs=1"])
    assert rcs2 == [0, 0], "\n".join(o[-3000:] for o in outs2)
    assert all("resumed from checkpoint step" in o for o in outs2), \
        outs2[0][-2000:]
    hist_r = json.load(
        open(os.path.join(out, "detailed_metrics.json")))["epochs"]

    # control: uninterrupted 2-epoch 2-process run
    out_c = str(tmp_path / "control")
    rcs3, outs3 = _run_training(bundle_path, out_c, n_procs=2,
                                port=_free_port())
    assert rcs3 == [0, 0], "\n".join(o[-3000:] for o in outs3)
    hist_c = json.load(
        open(os.path.join(out_c, "detailed_metrics.json")))["epochs"]
    # the resumed run's last epoch IS the control's epoch 2
    assert abs(hist_r[-1]["train_loss"] - hist_c[-1]["train_loss"]) < 1e-4, \
        (hist_r[-1], hist_c[-1])
    assert abs(hist_r[-1]["val_loss"] - hist_c[-1]["val_loss"]) < 1e-4
