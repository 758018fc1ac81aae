"""CLI smoke tests: preprocess -> train -> metrics artifacts, run
in-process (fast, CPU mesh)."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    """Write tiny raw .dat files so the preprocess CLI runs its real path."""
    d = tmp_path_factory.mktemp("raw")
    n_movies, n_users = 60, 40
    with open(d / "movies.dat", "w", encoding="latin-1") as f:
        for i in range(1, n_movies + 1):
            f.write(f"{i}::Movie {i} (199{i % 10})::Drama|Comedy\n")
    with open(d / "users.dat", "w") as f:
        for i in range(1, n_users + 1):
            f.write(f"{i}::{'M' if i % 2 else 'F'}::25::{i % 20}::00000\n")
    return str(d)


def test_preprocess_cli(raw_dir, tmp_path):
    sys.path.insert(0, "scripts")
    from scripts.preprocess import main as preprocess_main

    out = str(tmp_path / "bundle.npz")
    rc = preprocess_main([
        "--data_dir", raw_dir, "--output", out,
        "--synthetic_ratings", "1500", "--synthetic_seed", "3",
    ])
    assert rc == 0 and os.path.exists(out)
    from recsys_tpu.data.preprocessing import load_bundle

    b = load_bundle(out)
    assert len(b["train/user_id"]) > 500
    # deterministic re-run produces identical bundle
    out2 = str(tmp_path / "bundle2.npz")
    preprocess_main([
        "--data_dir", raw_dir, "--output", out2,
        "--synthetic_ratings", "1500", "--synthetic_seed", "3",
    ])
    b2 = load_bundle(out2)
    np.testing.assert_array_equal(b["train/movie_id"], b2["train/movie_id"])


def test_train_cli(raw_dir, tmp_path):
    from scripts.preprocess import main as preprocess_main
    from scripts.train import main as train_main

    bundle_path = str(tmp_path / "b.npz")
    preprocess_main(["--data_dir", raw_dir, "--output", bundle_path,
                     "--synthetic_ratings", "1500"])
    out_dir = str(tmp_path / "model")
    rc = train_main([
        "--data", bundle_path, "--output_dir", out_dir,
        "--embedding_dim", "8", "--batch_size", "128", "--epochs", "1",
        "--learning_rate", "0.1", "--no-bf16",
    ])
    assert rc == 0
    metrics = json.load(open(os.path.join(out_dir, "metrics.json")))
    assert "recall@10" in metrics
    assert os.path.exists(os.path.join(out_dir, "serving", "index.npz"))


def test_evaluate_cli(raw_dir, tmp_path, capsys):
    """recsys-eval: offline full-metric report + optional two-stage
    rerank eval from a trained bundle (the reference has no eval CLI)."""
    from scripts.evaluate import main as evaluate_main
    from scripts.preprocess import main as preprocess_main
    from scripts.train import main as train_main

    bundle_path = str(tmp_path / "b.npz")
    preprocess_main(["--data_dir", raw_dir, "--output", bundle_path,
                     "--synthetic_ratings", "1500"])
    out_dir = str(tmp_path / "model")
    train_main([
        "--data", bundle_path, "--output_dir", out_dir,
        "--embedding_dim", "8", "--batch_size", "128", "--epochs", "1",
        "--use_dense_features",
    ])
    report_path = str(tmp_path / "report.json")
    rc = evaluate_main([
        "--data", bundle_path, "--model_dir", f"{out_dir}/serving",
        "--split", "test", "--topk", "5", "10", "--filter_seen",
        "--rerank_candidates", "20", "--output", report_path,
    ])
    assert rc == 0
    report = json.load(open(report_path))
    for key in ("recall@10", "ndcg@10", "rating_rmse",
                "two_stage_recall@10", "two_stage_ndcg@10"):
        assert key in report, key
        assert np.isfinite(report[key])
    assert report["split"] == "test"


@pytest.mark.slow  # >40s: heavy SPMD/CLI lane (ROUND4 item 8)
def test_train_cli_spmd_flags(raw_dir, tmp_path):
    """The round-2 mesh flags end-to-end through the CLI: row-sharded
    tables read through the a2a lookup inside the train step, plus
    --per_replica_negatives (reference-parity negative scope) and
    --use_side_features (external feature merge) parse and train."""
    from scripts.preprocess import main as preprocess_main
    from scripts.train import main as train_main

    bundle_path = str(tmp_path / "b.npz")
    preprocess_main(["--data_dir", raw_dir, "--output", bundle_path,
                     "--synthetic_ratings", "1500"])
    out_dir = str(tmp_path / "spmd_model")
    rc = train_main([
        "--data", bundle_path, "--output_dir", out_dir,
        "--embedding_dim", "8", "--batch_size", "128", "--epochs", "1",
        "--no-bf16", "--model_parallel", "2",
        "--embedding_sharding", "rows", "--lookup_strategy", "a2a",
        "--per_replica_negatives",
        "--use_dense_features", "--use_side_features",
    ])
    assert rc == 0
    cfg = json.load(open(os.path.join(out_dir, "config.json")))
    assert cfg["mesh"]["lookup_strategy"] == "a2a"
    assert cfg["train"]["global_negatives"] is False
    metrics = json.load(open(os.path.join(out_dir, "metrics.json")))
    assert "recall@10" in metrics
    # side features made it into the served feature state
    import numpy as np

    feats = np.load(os.path.join(out_dir, "serving", "features.npz"),
                    allow_pickle=False)
    assert "user_side" in feats
