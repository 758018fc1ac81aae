#!/usr/bin/env python
"""Index-mined hard-negatives ablation (VERDICT r4 item 5).

Retrieval recall@10 plateaued at ~0.0153-0.0157 across rounds 2-4;
round 4's only quality lever (CBNS) hurt in the flagship regime. This
is the standard next step the repo had not yet run: mine TRUE hard
negatives from a trained index (each user's top-scoring seen-filtered
items — what the model confuses for positives) and feed them to the
explicit-negatives loss (``losses.sampled_softmax_explicit``) in a
second training phase.

Two-phase recipe, run end-to-end here:
  phase 1: the flagship c1 recipe (in-batch softmax only) -> bundle
  phase 2: SAME recipe + negative_sampling="mined" (pool mined from
           phase 1's encoder), fresh init — an honest A/B against
           phase 1, not a fine-tune whose extra epochs would confound.

A win or an honest no-gain both get committed
(benchmarks/results/negatives_mined.json); the reference's "hard"
strategy is popularity-only (``src/data_processing.py:300-312``) and is
never trained with at all (``src/trainer.py:79``).

  python benchmarks/negatives_mined.py [--epochs 30]
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
                       "results", "negatives_mined.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--num_hard", type=int, default=8)
    ap.add_argument("--num_random", type=int, default=8)
    ap.add_argument("--pool", type=int, default=50)
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO)

    import jax

    from bench import get_bundle
    from recsys_tpu.config import (
        DataConfig, EvalConfig, ModelConfig, RecsysConfig, TrainConfig,
    )
    from recsys_tpu.data.negative_sampling import mine_hard_negatives
    from recsys_tpu.train.trainer import Trainer

    bundle = get_bundle(1_000_209)

    def cfg_for(neg: str) -> RecsysConfig:
        # the exact c1 recipe (benchmarks/run_quality.py::run_one),
        # varying ONLY the explicit-negatives source
        return RecsysConfig(
            model=ModelConfig(embedding_dim=128, cross_layers=3,
                              mixed_precision=True),
            data=DataConfig(negative_sampling=neg,
                            num_hard_negatives=args.num_hard,
                            num_random_negatives=args.num_random,
                            mined_pool_size=args.pool),
            train=TrainConfig(batch_size=4096, epochs=args.epochs,
                              learning_rate=5e-3, optimizer="adam",
                              lr_decay_steps=100_000,
                              early_stop_patience=6,
                              early_stop_metric="val_recall@10",
                              eval_every_epochs=3, keep_checkpoints=1),
            eval=EvalConfig(topk=(5, 10, 20, 50), eval_batch_size=8192,
                            filter_seen=True, score_norm="dot"),
        )

    t0 = time.perf_counter()
    out = {}

    print("[mined] phase 1: flagship in-batch baseline", file=sys.stderr,
          flush=True)
    # "random" does not request explicit negatives, so phase 1 trains
    # in-batch-only — c1.json's recipe minus its "mixed" explicit
    # negatives, the clean control for adding ONLY the mined ones
    tr1 = Trainer(cfg_for("random"),
                  output_dir="outputs/bench_quality/mined_phase1")
    rep1 = tr1.train(bundle)
    out["phase1_in_batch"] = {
        "recall@10": rep1["recall@10"], "ndcg@10": rep1["ndcg@10"],
        "epochs_run": rep1["epochs_run"],
        "wall_s": round(time.perf_counter() - t0, 1),
    }

    print("[mined] mining pools from phase 1", file=sys.stderr, flush=True)
    params1 = jax.device_get(tr1.final_state.params)
    table = mine_hard_negatives(params1["towers"],
                                cfg_for("mined").model, bundle,
                                m=args.pool)

    print("[mined] phase 2: + index-mined hard negatives",
          file=sys.stderr, flush=True)
    t2 = time.perf_counter()
    tr2 = Trainer(cfg_for("mined"),
                  output_dir="outputs/bench_quality/mined_phase2")
    tr2.mined_table = table
    rep2 = tr2.train(bundle)
    out["phase2_mined"] = {
        "recall@10": rep2["recall@10"], "ndcg@10": rep2["ndcg@10"],
        "epochs_run": rep2["epochs_run"],
        "wall_s": round(time.perf_counter() - t2, 1),
    }

    gain = rep2["recall@10"] / max(rep1["recall@10"], 1e-12) - 1.0
    out.update({
        "config": {
            "num_hard": args.num_hard, "num_random": args.num_random,
            "pool": args.pool, "epochs": args.epochs,
            "platform": jax.devices()[0].platform,
        },
        "recall_gain": round(gain, 4),
        "verdict": (
            f"index-mined hard negatives "
            f"{'WIN' if gain > 0.01 else ('LOSE' if gain < -0.01 else 'WASH')}"
            f": {rep1['recall@10']:.5f} -> {rep2['recall@10']:.5f} "
            f"({gain:+.2%}) at matched recipe/epochs"
        ),
    })
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
