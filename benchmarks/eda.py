#!/usr/bin/env python
"""Scripted exploratory data analysis (C24 parity — the reference ships
two EDA notebooks, ``notebooks/01_exploratory_data_analysis.ipynb`` and
``02_basic_analysis.ipynb``; this produces the same analyses
reproducibly: ratings distribution, sparsity, temporal patterns, user
demographics, genre counts, and consistency checks).

  python benchmarks/eda.py [--data_dir DIR] [--out benchmarks/results/eda.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_eda(data_dir: str, synthetic_ratings=None) -> dict:
    import pandas as pd

    from recsys_tpu.data.movielens import GENRES, load_movielens_data

    raw = load_movielens_data(data_dir, synthetic_ratings=synthetic_ratings)
    ratings, movies, users = raw["ratings"], raw["movies"], raw["users"]

    out: dict = {}
    # ---- ratings distribution --------------------------------------
    counts = ratings["rating"].value_counts().sort_index()
    out["rating_distribution"] = {str(k): int(v) for k, v in counts.items()}
    out["mean_rating"] = float(ratings["rating"].mean())

    # ---- scale + sparsity ------------------------------------------
    n_users = ratings["user_id"].nunique()
    n_movies = ratings["movie_id"].nunique()
    out["n_ratings"] = int(len(ratings))
    out["n_users"] = int(n_users)
    out["n_movies"] = int(n_movies)
    out["sparsity"] = float(1.0 - len(ratings) / (n_users * n_movies))

    # ---- temporal patterns -----------------------------------------
    dt = pd.to_datetime(ratings["timestamp"], unit="s")
    out["ratings_by_year"] = {
        str(k): int(v) for k, v in dt.dt.year.value_counts().sort_index().items()
    }
    out["ratings_by_hour_top3"] = [
        int(h) for h in dt.dt.hour.value_counts().index[:3]
    ]

    # ---- user activity / item popularity ---------------------------
    per_user = ratings.groupby("user_id").size()
    per_movie = ratings.groupby("movie_id").size()
    out["ratings_per_user"] = {
        "min": int(per_user.min()), "median": float(per_user.median()),
        "p95": float(per_user.quantile(0.95)), "max": int(per_user.max()),
    }
    out["ratings_per_movie"] = {
        "median": float(per_movie.median()), "max": int(per_movie.max()),
    }

    # ---- demographics ----------------------------------------------
    out["gender_counts"] = {
        str(k): int(v) for k, v in users["gender"].value_counts().items()
    }
    out["age_group_counts"] = {
        str(k): int(v) for k, v in users["age"].value_counts().sort_index().items()
    }

    # ---- genres -----------------------------------------------------
    genre_counts = {g: 0 for g in GENRES}
    for gs in movies["genres"]:
        for g in str(gs).split("|"):
            if g in genre_counts:
                genre_counts[g] += 1
    out["genre_counts"] = genre_counts

    # ---- consistency checks (02_basic_analysis cell 10 parity) -----
    users_in_ratings = set(ratings["user_id"].unique())
    users_in_table = set(users["user_id"].unique())
    movies_in_ratings = set(ratings["movie_id"].unique())
    movies_in_table = set(movies["movie_id"].unique())
    out["consistency"] = {
        "rating_users_missing_from_users_table": len(users_in_ratings - users_in_table),
        "rating_movies_missing_from_movies_table": len(movies_in_ratings - movies_in_table),
        "duplicate_user_movie_pairs": int(
            ratings.duplicated(["user_id", "movie_id"]).sum()
        ),
    }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--out", default="benchmarks/results/eda.json")
    ap.add_argument("--synthetic_ratings", type=int, default=None)
    args = ap.parse_args()
    data_dir = args.data_dir or (
        "data/raw" if os.path.exists("data/raw/movies.dat")
        else "/root/reference/data/raw"
    )
    report = run_eda(data_dir, args.synthetic_ratings)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
