#!/usr/bin/env python
"""Oracle ceiling for a synthetic bundle: the recall an ideal model
(scoring with the generator's true latents) achieves under seen-item
masking. Trained-model quality in ``benchmarks/results`` is reported as
a fraction of this ceiling — the honest quality metric when the real
``ratings.dat`` is unavailable (BASELINE.md) and the reference's
TF stack cannot run in this environment.

  python benchmarks/oracle.py [--bundle data/processed/bench_bundle.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def oracle_report(bundle, data_dir: str, seed: int = 1,
                  topk=(10, 50)) -> dict:
    from recsys_tpu.data.movielens import (
        AFFINITY_WEIGHT, POPULARITY_WEIGHT, _read_dat, latent_preference_model,
    )

    movies = _read_dat(os.path.join(data_dir, "movies.dat"),
                       ["movie_id", "title", "genres"])
    users = _read_dat(os.path.join(data_dir, "users.dat"),
                      ["user_id", "gender", "age", "occupation", "zip"])
    U, V, log_pop, scale, _, _ = latent_preference_model(
        users["user_id"].to_numpy(), movies["movie_id"].to_numpy(),
        movies["genres"].to_numpy(), seed,
    )
    u_row = {int(r): i for i, r in enumerate(users["user_id"].to_numpy())}
    m_row = {int(r): i for i, r in enumerate(movies["movie_id"].to_numpy())}
    gu = np.array([u_row[int(r)] for r in bundle["meta/user_raw_ids"]])
    gm = np.array([m_row[int(r)] for r in bundle["meta/movie_raw_ids"]])
    nU, nI = len(gu), len(gm)
    seen = np.zeros((nU, nI), bool)
    seen[bundle["train/user_id"], bundle["train/movie_id"]] = True
    vu, vm = bundle["val/user_id"], bundle["val/movie_id"]
    S = AFFINITY_WEIGHT * scale * (U[gu] @ V[gm].T) + POPULARITY_WEIGHT * log_pop[gm][None, :]
    S = np.where(seen, -1e9, S)
    out = {}
    for k in topk:
        top = np.argpartition(-S, k, axis=1)[:, :k]
        hit = np.zeros(nU, dtype=object)
        out[f"oracle_recall@{k}"] = float(
            np.mean([(vm[i] in top[vu[i]]) for i in range(len(vu))])
        )
    # popularity baseline for context
    pop = np.bincount(bundle["train/movie_id"], minlength=nI)
    for k in topk:
        topp = set(np.argsort(-pop)[:k].tolist())
        out[f"popularity_recall@{k}"] = float(np.mean([m in topp for m in vm]))
    out["random_recall@10"] = 10.0 / nI
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle", default="data/processed/bench_bundle.npz")
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    from recsys_tpu.data.preprocessing import load_bundle

    data_dir = args.data_dir or (
        "data/raw" if os.path.exists("data/raw/movies.dat")
        else "/root/reference/data/raw"
    )
    bundle = load_bundle(args.bundle)
    report = oracle_report(bundle, data_dir, args.seed)
    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/oracle.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
