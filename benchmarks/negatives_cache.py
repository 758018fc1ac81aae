#!/usr/bin/env python
"""CBNS negative-cache ablation (arXiv:2110.15154 —
``TrainConfig.negative_cache``): the c1 retrieval recipe with cache
sizes 0 / 4B / 16B on the same bundle + eval protocol as the committed
quality configs. Records recall + the measured per-step cost of the
extra candidate columns.

Run (TPU): python benchmarks/negatives_cache.py
Writes benchmarks/results/negatives_cache.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import logging

    logging.basicConfig(level=logging.WARNING)

    from bench import get_bundle
    from benchmarks.run_quality import CONFIGS, run_one

    bundle = get_bundle(1_000_209)
    base = dict(CONFIGS["c1"])
    b = base["batch_size"]
    out = {"base_config": "c1", "batch": b}
    for cache_mult in (0, 4, 16):
        spec = {**base, "negative_cache": cache_mult * b}
        t0 = time.time()
        rep = run_one(f"c1_cache{cache_mult}x", spec, bundle)
        key = f"cache_{cache_mult}x"
        out[key] = {
            "negative_cache": cache_mult * b,
            "recall@10": round(float(rep["recall@10"]), 6),
            "recall@50": round(float(rep["recall@50"]), 6),
            "ndcg@10": round(float(rep["ndcg@10"]), 6),
            "epochs_run": rep.get("epochs_run"),
            "examples_per_s": round(float(rep.get("examples_per_s", 0)), 1),
            "wall_s": round(time.time() - t0, 1),
        }
        print(json.dumps({key: out[key]}))
    r0 = out["cache_0x"]["recall@10"]
    out["relative_recall@10"] = {
        k: round(out[k]["recall@10"] / r0, 4)
        for k in ("cache_0x", "cache_4x", "cache_16x")
    }

    # the technique's INTENDED regime: B << catalog, where the in-batch
    # negative pool is scarce (B=256 vs 3,883 items — each step sees
    # <7% of the catalog as negatives; the cache multiplies the pool)
    small = {**base, "batch_size": 256, "epochs": 12}
    out["small_batch"] = {"batch": 256}
    for cache_mult in (0, 16):
        spec = {**small, "negative_cache": cache_mult * 256}
        rep = run_one(f"c1_smallB_cache{cache_mult}x", spec, bundle)
        out["small_batch"][f"cache_{cache_mult}x_recall@10"] = round(
            float(rep["recall@10"]), 6)
        print(json.dumps({f"smallB_cache_{cache_mult}x":
                          out["small_batch"][f"cache_{cache_mult}x_recall@10"]}))
    out["small_batch"]["relative"] = round(
        out["small_batch"]["cache_16x_recall@10"]
        / max(out["small_batch"]["cache_0x_recall@10"], 1e-9), 4)
    path = "benchmarks/results/negatives_cache.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
