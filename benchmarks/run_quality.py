#!/usr/bin/env python
"""Quality-benchmark runner for the BASELINE.json configs[0..3].

The reference publishes no quality numbers (BASELINE.md), so these runs
ARE the baseline record: each config trains on the deterministic
ML-1M-scale synthetic dataset (seed-pinned) and writes its full metric
report to ``benchmarks/results/<name>.json``.

  python benchmarks/run_quality.py --config c1   # or c0/c2/c3/all
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    # BASELINE.json configs[0]: two-tower retrieval, dim 32, batch 512
    "c0": dict(embedding_dim=32, batch_size=512, epochs=6, cross_layers=1,
               negative_sampling="random", lr=5e-3),
    # configs[1]: dim 128, batch 4096, mixed negatives, full eval
    "c1": dict(embedding_dim=128, batch_size=4096, epochs=30, cross_layers=3,
               negative_sampling="mixed", lr=5e-3),
    # configs[2]: DCN ranking focus (3 cross layers, multi-task weights)
    "c2": dict(embedding_dim=64, batch_size=2048, epochs=15, cross_layers=3,
               negative_sampling="random", lr=5e-3, ctr_weight=2.0,
               rating_weight=0.2),
    # configs[3]: full two-stage pipeline (retrieval -> topk -> rerank eval)
    "c3": dict(embedding_dim=128, batch_size=4096, epochs=30, cross_layers=3,
               negative_sampling="random", lr=5e-3, two_stage_eval=True),
    # c3 + engineered dense features in the DCN ranking input (the
    # feature set the reference computes but never trains on): measures
    # what the features buy the CTR head / two-stage rerank
    "c3d": dict(embedding_dim=128, batch_size=4096, epochs=30, cross_layers=3,
                negative_sampling="random", lr=5e-3, two_stage_eval=True,
                dense_features=True),
    # c1 with the three retrieval-loss upgrades over the reference's
    # plain tfrs.tasks.Retrieval DISABLED (logQ correction, learned item
    # bias, accidental-hit masking): the attribution run BASELINE.md's
    # quality-gap table cites (VERDICT r2 item 2)
    "c1_ablated": dict(embedding_dim=128, batch_size=4096, epochs=30,
                       cross_layers=3, negative_sampling="mixed", lr=5e-3,
                       ablate_upgrades=True),
}


def run_one(name: str, spec: dict, bundle) -> dict:
    import jax

    from recsys_tpu.config import (
        DataConfig, EvalConfig, ModelConfig, RecsysConfig, TrainConfig,
    )
    from recsys_tpu.train.trainer import Trainer

    dense = 0
    if spec.get("dense_features"):
        from recsys_tpu.data.features import FeatureEngineer

        dense = FeatureEngineer.n_features()
    ablate = bool(spec.get("ablate_upgrades"))
    cfg = RecsysConfig(
        model=ModelConfig(
            embedding_dim=spec["embedding_dim"],
            cross_layers=spec["cross_layers"],
            ctr_weight=spec.get("ctr_weight", 2.0),
            rating_weight=spec.get("rating_weight", 0.2),
            mixed_precision=True,
            dense_features=dense,
            use_item_bias=not ablate,
            accidental_hit_mask=not ablate,
        ),
        data=DataConfig(negative_sampling=spec["negative_sampling"],
                        num_hard_negatives=4, num_random_negatives=8),
        train=TrainConfig(batch_size=spec["batch_size"], epochs=spec["epochs"],
                          learning_rate=spec["lr"], optimizer="adam",
                          negative_cache=spec.get("negative_cache", 0),
                          logq_correction=not ablate,
                          lr_decay_steps=100_000, early_stop_patience=6,
                          early_stop_metric="val_recall@10",
                          eval_every_epochs=3, keep_checkpoints=1,
                          # replica-desync detector every 2 epochs: a
                          # no-op on one chip (n_data == 1), live on any
                          # data-parallel run of these same configs
                          replication_check_every_epochs=2),
        eval=EvalConfig(topk=(5, 10, 20, 50), eval_batch_size=8192,
                        filter_seen=True, score_norm="dot"),
    )
    out_dir = f"outputs/bench_quality/{name}"
    t0 = time.time()
    trainer = Trainer(cfg, output_dir=out_dir)
    report = trainer.train(bundle)
    report["wall_time_s"] = time.time() - t0
    report["config_name"] = name
    report["platform"] = jax.devices()[0].platform

    if spec.get("two_stage_eval"):
        report.update(two_stage_eval(trainer, cfg, bundle))
    return report


def two_stage_eval(trainer, cfg, bundle) -> dict:
    """configs[3]: retrieval top-200 candidates -> DCN rerank ->
    recall@10 of the reranked list (the full two-stage serving path
    scored offline, via the shared library evaluator). Two rows: the
    ctr-only default (weight 0.25) and the round-5 joint optimum
    (ctr 0.1 + rating 0.25, rerank_weight_sweep.json — the trained
    rating head as a third rerank signal)."""
    import jax

    from recsys_tpu.retrieval.evaluator import two_stage_evaluate

    # known cost (review r5, accepted): the two rows re-run candidate
    # generation (~35 s) although only the rerank weights differ — the
    # evaluator doesn't expose a retrieve-once/rerank-twice split, and
    # an eval-only 2x isn't worth widening its API for
    params = jax.device_get(trainer.final_state.params)
    eng = getattr(trainer, "_feature_engineer", None)
    out = two_stage_evaluate(
        params, cfg.model, bundle,
        split="val", n_cand=200, ctr_weight=0.25, topk=10, engineer=eng,
    )
    joint = two_stage_evaluate(
        params, cfg.model, bundle,
        split="val", n_cand=200, ctr_weight=0.1, rating_weight=0.25,
        topk=10, engineer=eng,
    )
    out.update({
        "two_stage_joint_recall@10": joint["two_stage_recall@10"],
        "two_stage_joint_ndcg@10": joint["two_stage_ndcg@10"],
        "two_stage_joint_weights": {"ctr": 0.1, "rating": 0.25},
    })
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="c1", choices=[*CONFIGS, "all"])
    ap.add_argument("--ratings", type=int, default=1_000_209)
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO)

    from bench import get_bundle

    bundle = get_bundle(args.ratings)
    names = list(CONFIGS) if args.config == "all" else [args.config]
    os.makedirs("benchmarks/results", exist_ok=True)
    for name in names:
        report = run_one(name, CONFIGS[name], bundle)
        path = f"benchmarks/results/{name}.json"
        with open(path, "w") as f:
            json.dump({k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
                       for k, v in report.items()}, f, indent=2)
        print(name, "->", path)
        print(json.dumps({k: round(v, 4) for k, v in report.items()
                          if isinstance(v, float)}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
