#!/usr/bin/env python
"""Two-stage rerank weight sweep, now with the RATING head axis
(VERDICT r4 item 6).

The trained rating head contributed nothing to any serving or
two-stage path through round 4 (rerank used the CTR logit alone) — the
same shape of trained-but-unused gap this repo flags in the reference's
feature pipeline (the reference never serves ITS rating head either,
``/root/reference/src/models.py:119``). This sweep scores
``retrieval + w_ctr*ctr_logit + w_rating*rating_pred`` on the trained
c3d bundle's offline two-stage eval and either earns the head a
serving role or records its measured rejection.

  python benchmarks/rerank_sweep.py
Writes benchmarks/results/rerank_weight_sweep.json (full matrix +
verdict), replacing the round-3 ctr-only artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "rerank_weight_sweep.json")
BUNDLE_DIR = "outputs/bench_quality/c3d/serving"


def main() -> int:
    import jax

    from bench import get_bundle
    from recsys_tpu.config import RecsysConfig
    from recsys_tpu.retrieval.evaluator import two_stage_evaluate
    from recsys_tpu.train.checkpoint import load_model_params

    t0 = time.perf_counter()
    bundle = get_bundle(1_000_209)
    params = load_model_params(BUNDLE_DIR)
    cfg = RecsysConfig.load(os.path.join(BUNDLE_DIR, "config.json"))

    rows = []
    best = None
    for w_ctr in (0.1, 0.25):
        for w_rating in (0.0, 0.02, 0.05, 0.1, 0.25, 0.5):
            r = two_stage_evaluate(
                params, cfg.model, bundle, split="val", n_cand=200,
                ctr_weight=w_ctr, rating_weight=w_rating, topk=10,
            )
            row = {
                "ctr_weight": w_ctr,
                "rating_weight": w_rating,
                "recall@10": r["two_stage_recall@10"],
                "ndcg@10": r["two_stage_ndcg@10"],
            }
            rows.append(row)
            if best is None or row["recall@10"] > best["recall@10"]:
                best = row
            print(f"[rerank_sweep +{time.perf_counter() - t0:6.1f}s] "
                  f"ctr={w_ctr} rating={w_rating} -> "
                  f"recall@10 {row['recall@10']:.5f} "
                  f"ndcg@10 {row['ndcg@10']:.5f}",
                  file=sys.stderr, flush=True)

    baseline = next(r for r in rows
                    if r["ctr_weight"] == 0.25 and r["rating_weight"] == 0.0)
    gain = best["recall@10"] / max(baseline["recall@10"], 1e-12) - 1.0
    out = {
        "bundle": BUNDLE_DIR,
        "split": "val",
        "candidates": 200,
        "sweep": rows,
        "baseline_ctr_only": baseline,
        "best": best,
        "rating_head_gain_vs_ctr_only": round(gain, 4),
        "verdict": (
            f"rating head {'EARNS a serving role' if gain > 0.005 else 'REJECTED for serving'}: "
            f"best (ctr={best['ctr_weight']}, rating={best['rating_weight']}) "
            f"recall@10 {best['recall@10']:.5f} vs ctr-only baseline "
            f"{baseline['recall@10']:.5f} ({gain:+.2%})"
        ),
    }
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("best", "baseline_ctr_only", "verdict")}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
