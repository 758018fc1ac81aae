#!/usr/bin/env python
"""Index-mined hard-negatives ablation (VERDICT r4 item 5).

Retrieval recall@10 plateaued at ~0.0153-0.0157 across rounds 2-4;
round 4's only quality lever (CBNS) hurt in the flagship regime. This
is the standard next step the repo had not yet run: mine TRUE hard
negatives from a trained index (each user's top-scoring seen-filtered
items — what the model confuses for positives) and feed them to the
explicit-negatives loss (``losses.sampled_softmax_explicit``) in a
second training phase.

Three-arm recipe, run end-to-end here:
  arm 1: the flagship c1 recipe (in-batch softmax only) -> bundle
  arm 2: SAME recipe + negative_sampling="mined", pool = ranks [0, 50)
         of arm 1's index — naive top-of-index mining
  arm 3: SAME but pool = ranks [10, 60) (``--skip_top 10``): the
         held-out next items a user will actually pick live at the
         index head (unseen by construction), so arm 2 trains AGAINST
         future positives; skipping the head is the standard
         false-negative mitigation.
Each mined arm is a fresh init — an honest A/B against arm 1, not a
fine-tune whose extra epochs would confound.

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
    ap.add_argument("--skip_top", type=int, default=10)
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

    def cfg_for(neg: str, weight: float = 1.0) -> RecsysConfig:
        # the exact c1 recipe (benchmarks/run_quality.py::run_one),
        # varying ONLY the explicit-negatives source/weight
        return RecsysConfig(
            model=ModelConfig(embedding_dim=128, cross_layers=3,
                              mixed_precision=True,
                              explicit_negatives_weight=weight),
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

    params1 = jax.device_get(tr1.final_state.params)

    def mined_arm(tag: str, skip_top: int, weight: float = 1.0) -> dict:
        print(f"[mined] arm {tag}: mining ranks "
              f"[{skip_top}, {skip_top + args.pool}), weight {weight}",
              file=sys.stderr, flush=True)
        table = mine_hard_negatives(params1["towers"],
                                    cfg_for("mined").model, bundle,
                                    m=args.pool, skip_top=skip_top)
        t2 = time.perf_counter()
        tr = Trainer(cfg_for("mined", weight),
                     output_dir=f"outputs/bench_quality/mined_{tag}")
        tr.mined_table = table
        rep = tr.train(bundle)
        return {
            "skip_top": skip_top, "weight": weight,
            "recall@10": rep["recall@10"], "ndcg@10": rep["ndcg@10"],
            "epochs_run": rep["epochs_run"],
            "wall_s": round(time.perf_counter() - t2, 1),
        }

    out["phase2_mined_top"] = mined_arm("top", 0)
    out["phase3_mined_skip"] = mined_arm("skip", args.skip_top)
    # arm 4: the false-negative pressure scaled down — skip + 0.1x
    # explicit weight (the gentlest standard recipe)
    out["phase4_mined_skip_lowweight"] = mined_arm(
        "skip_lw", args.skip_top, 0.1)

    def vs_base(rep) -> float:
        return rep["recall@10"] / max(rep1["recall@10"], 1e-12) - 1.0

    g_top = vs_base(out["phase2_mined_top"])
    g_skip = vs_base(out["phase3_mined_skip"])
    g_lw = vs_base(out["phase4_mined_skip_lowweight"])
    best = max(g_top, g_skip, g_lw)
    out.update({
        "config": {
            "num_hard": args.num_hard, "num_random": args.num_random,
            "pool": args.pool, "skip_top": args.skip_top,
            "epochs": args.epochs,
            "platform": jax.devices()[0].platform,
        },
        "recall_gain_top": round(g_top, 4),
        "recall_gain_skip": round(g_skip, 4),
        "recall_gain_skip_lowweight": round(g_lw, 4),
        "verdict": (
            f"index-mined hard negatives "
            f"{'WIN' if best > 0.01 else ('LOSE' if best < -0.01 else 'WASH')}"
            f": baseline {rep1['recall@10']:.5f}, ranks[0,{args.pool}) "
            f"{out['phase2_mined_top']['recall@10']:.5f} ({g_top:+.2%}), "
            f"ranks[{args.skip_top},{args.skip_top + args.pool}) "
            f"{out['phase3_mined_skip']['recall@10']:.5f} ({g_skip:+.2%}), "
            f"same ranks at 0.1x weight "
            f"{out['phase4_mined_skip_lowweight']['recall@10']:.5f} "
            f"({g_lw:+.2%}) at matched recipe/epochs"
        ),
    })
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
