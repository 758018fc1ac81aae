#!/usr/bin/env python
"""Do the round-5 quality levers COMPOUND? (follow-on to
rerank_weight_sweep.json and negatives_mined.json)

Round 5 found two independent wins over the c3d flagship:
  - rating-head rerank at (ctr 0.1, rating 0.25): +2.1% two-stage
    recall@10 (rerank_weight_sweep.json)
  - index-mined hard negatives at skip_top=10 + 0.1x explicit weight:
    +1.45% retrieval recall@10 (negatives_mined.json arm 4)
This run stacks them: retrain the c3d recipe with the mined-negatives
arm-4 settings (pools mined from the committed c3d bundle — the
two-phase production recipe via ``data.mined_from``), then score the
full two-stage path with BOTH rerank heads at the swept optimum.
Either a compounding gain or an honest interaction loss gets committed
(benchmarks/results/quality_stack.json).

  python benchmarks/quality_stack.py [--epochs 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "quality_stack.json")
C3D_BUNDLE = "outputs/bench_quality/c3d/serving"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO)

    import jax

    from bench import get_bundle
    from recsys_tpu.config import (
        DataConfig, EvalConfig, ModelConfig, RecsysConfig, TrainConfig,
    )
    from recsys_tpu.data.features import FeatureEngineer
    from recsys_tpu.retrieval.evaluator import two_stage_evaluate
    from recsys_tpu.train.trainer import Trainer

    if not os.path.isdir(C3D_BUNDLE):
        print(f"missing {C3D_BUNDLE}: run "
              "`python benchmarks/run_quality.py --config c3d` first",
              file=sys.stderr)
        return 2

    bundle = get_bundle(1_000_209)
    # the exact c3d recipe (run_quality.py::CONFIGS['c3d']) + the
    # negatives_mined.json arm-4 settings
    cfg = RecsysConfig(
        model=ModelConfig(embedding_dim=128, cross_layers=3,
                          mixed_precision=True,
                          dense_features=FeatureEngineer.n_features(),
                          explicit_negatives_weight=0.1),
        data=DataConfig(negative_sampling="mined",
                        mined_from=C3D_BUNDLE, mined_skip_top=10,
                        num_hard_negatives=8, num_random_negatives=8,
                        mined_pool_size=50),
        train=TrainConfig(batch_size=4096, epochs=args.epochs,
                          learning_rate=5e-3, optimizer="adam",
                          lr_decay_steps=100_000, early_stop_patience=6,
                          early_stop_metric="val_recall@10",
                          eval_every_epochs=3, keep_checkpoints=1),
        eval=EvalConfig(topk=(5, 10, 20, 50), eval_batch_size=8192,
                        filter_seen=True, score_norm="dot"),
    )
    t0 = time.perf_counter()
    tr = Trainer(cfg, output_dir="outputs/bench_quality/stack")
    rep = tr.train(bundle)

    params = jax.device_get(tr.final_state.params)
    eng = getattr(tr, "_feature_engineer", None)
    two = {}
    for w_ctr, w_rating, tag in ((0.25, 0.0, "ctr_only"),
                                 (0.1, 0.25, "joint_optimum")):
        r = two_stage_evaluate(params, cfg.model, bundle, split="val",
                               n_cand=200, ctr_weight=w_ctr,
                               rating_weight=w_rating, topk=10,
                               engineer=eng)
        two[tag] = {"ctr_weight": w_ctr, "rating_weight": w_rating,
                    "recall@10": r["two_stage_recall@10"],
                    "ndcg@10": r["two_stage_ndcg@10"]}
        print(f"[stack] two-stage {tag}: {two[tag]}", file=sys.stderr,
              flush=True)

    # committed comparison points (benchmarks/results/*.json)
    base_retr = 0.01535    # c3d.json retrieval recall@10
    base_two = 0.02332     # rerank_weight_sweep.json best (no mined negs)
    out = {
        "recipe": "c3d + mined(skip_top=10, weight=0.1) + rating rerank",
        "retrieval_recall@10": rep["recall@10"],
        "retrieval_vs_c3d": round(rep["recall@10"] / base_retr - 1.0, 4),
        "two_stage": two,
        "stack_vs_best_committed": round(
            two["joint_optimum"]["recall@10"] / base_two - 1.0, 4),
        "epochs_run": rep["epochs_run"],
        "wall_s": round(time.perf_counter() - t0, 1),
        "platform": jax.devices()[0].platform,
        "baselines": {"c3d_retrieval": base_retr,
                      "rerank_sweep_best_two_stage": base_two},
    }
    gain = out["stack_vs_best_committed"]
    out["verdict"] = (
        f"levers {'COMPOUND' if gain > 0.005 else ('INTERFERE' if gain < -0.005 else 'WASH')}: "
        f"stacked two-stage recall@10 "
        f"{two['joint_optimum']['recall@10']:.5f} vs best committed "
        f"single-lever {base_two:.5f} ({gain:+.2%})"
    )
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
