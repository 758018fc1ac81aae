"""Offline preprocessing: raw MovieLens -> dense-int training bundle.

Capability parity with ``preprocessing_pipeline`` (``src/preprocessing.py:12-121``):

* timestamp -> datetime-derived fields (hour, dow, year),
* **sequential id remap** for users/movies (``:30-35``) — here the dense
  ids are the canonical representation end-to-end (no string round-trip
  through vocab lookups; SURVEY §7.1.2),
* genre multi-hot (``:41-47``), demographic categorical codes (``:49-52``),
* movie year from title regex, median-filled, min-max normalized (``:55-64``),
* ``age_at_rating`` (``:67-68``),
* **temporal 80/10/10 split** on timestamp (``:71-78``),
* train-only user/movie mean/count/std stats joined to all splits (``:80-96``),
* implicit label ``rating >= threshold`` (``:98-100``) — threshold is one
  config field (resolves the reference's 4-vs-3 inconsistency,
  ``src/preprocessing.py:100`` vs ``src/trainer.py:106``).

Output is a flat dict of numpy arrays (saved as ``.npz``) instead of a
pickle of DataFrames: columnar, mmap-able, and directly consumable by
the device input pipeline.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Dict, Optional

import numpy as np
import pandas as pd

from recsys_tpu.data.movielens import GENRES, load_movielens_data

logger = logging.getLogger(__name__)

SPLITS = ("train", "val", "test")
_YEAR_RE = re.compile(r"\((\d{4})\)")


def preprocessing_pipeline(
    ratings: pd.DataFrame,
    movies: pd.DataFrame,
    users: pd.DataFrame,
    implicit_threshold: float = 4.0,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> Dict[str, np.ndarray]:
    """Run the full preprocessing pipeline; returns a flat columnar
    bundle ``{f"{split}/{column}": array, "meta/...": array}``."""
    df = ratings.copy()

    # ---- sequential dense id remap (src/preprocessing.py:30-35) ------
    uniq_users = np.sort(df["user_id"].unique())
    uniq_movies = np.sort(df["movie_id"].unique())
    user_map = {u: i for i, u in enumerate(uniq_users)}
    movie_map = {m: i for i, m in enumerate(uniq_movies)}
    df["uid"] = df["user_id"].map(user_map).astype(np.int32)
    df["mid"] = df["movie_id"].map(movie_map).astype(np.int32)

    # ---- temporal fields --------------------------------------------
    ts = df["timestamp"].to_numpy(np.int64)
    dt = pd.to_datetime(ts, unit="s")
    df["hour"] = dt.hour.astype(np.int32)
    df["dayofweek"] = dt.dayofweek.astype(np.int32)
    df["rating_year"] = dt.year.astype(np.int32)

    # ---- movie-side features (genre multi-hot, year) -----------------
    movies = movies.set_index("movie_id")
    n_movies = len(uniq_movies)
    genre_mh = np.zeros((n_movies, len(GENRES)), np.float32)
    years = np.full(n_movies, np.nan, np.float32)
    gidx = {g: i for i, g in enumerate(GENRES)}
    titles = movies["title"].astype(str)
    for raw_id, dense in movie_map.items():
        if raw_id in movies.index:
            for g in str(movies.loc[raw_id, "genres"]).split("|"):
                if g in gidx:
                    genre_mh[dense, gidx[g]] = 1.0
            m = _YEAR_RE.search(titles.loc[raw_id])
            if m:
                years[dense] = float(m.group(1))
    med = np.nanmedian(years) if np.isfinite(years).any() else 1990.0
    years = np.where(np.isnan(years), med, years)
    yr_min, yr_max = years.min(), years.max()
    movie_year_norm = ((years - yr_min) / max(yr_max - yr_min, 1.0)).astype(np.float32)

    # ---- user-side demographics (src/preprocessing.py:49-52) ---------
    users = users.set_index("user_id")
    n_users = len(uniq_users)
    u_gender = np.zeros(n_users, np.int32)
    u_age = np.zeros(n_users, np.int32)
    u_occ = np.zeros(n_users, np.int32)
    age_code = {a: i for i, a in enumerate([1, 18, 25, 35, 45, 50, 56])}
    for raw_id, dense in user_map.items():
        if raw_id in users.index:
            row = users.loc[raw_id]
            u_gender[dense] = 1 if row["gender"] == "M" else 0
            u_age[dense] = age_code.get(int(row["age"]), 0)
            u_occ[dense] = int(row["occupation"])
    age_years = np.array([1, 18, 25, 35, 45, 50, 56], np.float32)
    df["age_at_rating"] = (
        age_years[u_age[df["uid"].to_numpy()]]
        + (df["rating_year"].to_numpy() - 2000)
    ).astype(np.float32)

    # ---- temporal split (src/preprocessing.py:71-78) -----------------
    df = df.sort_values("timestamp", kind="stable").reset_index(drop=True)
    n = len(df)
    n_train = int(n * train_frac)
    n_val = int(n * val_frac)
    bounds = {"train": (0, n_train), "val": (n_train, n_train + n_val),
              "test": (n_train + n_val, n)}

    # ---- train-only per-entity stats (src/preprocessing.py:80-96) ----
    tr = df.iloc[: n_train]
    def _stats(ids, values, size):
        cnt = np.bincount(ids, minlength=size).astype(np.float32)
        s = np.bincount(ids, weights=values, minlength=size).astype(np.float32)
        mean = np.where(cnt > 0, s / np.maximum(cnt, 1), values.mean())
        sq = np.bincount(ids, weights=values ** 2, minlength=size).astype(np.float32)
        var = np.maximum(sq / np.maximum(cnt, 1) - mean ** 2, 0.0)
        std = np.where(cnt > 1, np.sqrt(var), 0.0)
        return cnt, mean.astype(np.float32), std.astype(np.float32)

    tr_r = tr["rating"].to_numpy(np.float32)
    u_cnt, u_mean, u_std = _stats(tr["uid"].to_numpy(), tr_r, n_users)
    m_cnt, m_mean, m_std = _stats(tr["mid"].to_numpy(), tr_r, n_movies)

    # ---- implicit label ---------------------------------------------
    df["y_implicit"] = (df["rating"] >= implicit_threshold).astype(np.float32)

    out: Dict[str, np.ndarray] = {}
    per_row_cols = {
        "user_id": ("uid", np.int32),
        "movie_id": ("mid", np.int32),
        "rating": ("rating", np.float32),
        "y_implicit": ("y_implicit", np.float32),
        "timestamp": ("timestamp", np.int64),
        "hour": ("hour", np.int32),
        "dayofweek": ("dayofweek", np.int32),
        "age_at_rating": ("age_at_rating", np.float32),
    }
    for split, (lo, hi) in bounds.items():
        part = df.iloc[lo:hi]
        for name, (col, dtype) in per_row_cols.items():
            out[f"{split}/{name}"] = part[col].to_numpy().astype(dtype)

    out["meta/n_users"] = np.int64(n_users)
    out["meta/n_movies"] = np.int64(n_movies)
    out["meta/implicit_threshold"] = np.float32(implicit_threshold)
    out["meta/user_raw_ids"] = uniq_users.astype(np.int64)
    out["meta/movie_raw_ids"] = uniq_movies.astype(np.int64)
    out["meta/movie_genres"] = genre_mh
    out["meta/movie_year_norm"] = movie_year_norm
    out["meta/user_gender"] = u_gender
    out["meta/user_age"] = u_age
    out["meta/user_occupation"] = u_occ
    out["meta/user_count"] = u_cnt
    out["meta/user_mean"] = u_mean
    out["meta/user_std"] = u_std
    out["meta/movie_count"] = m_cnt
    out["meta/movie_mean"] = m_mean
    out["meta/movie_std"] = m_std
    return out


def check_preprocessing_quality(bundle: Dict[str, np.ndarray]) -> Dict[str, float]:
    """QA invariants (parity with ``check_preprocessing_quality``,
    ``src/preprocessing.py:124-142``) — but *asserting*, not printing."""
    n_users = int(bundle["meta/n_users"])
    n_movies = int(bundle["meta/n_movies"])
    report: Dict[str, float] = {}
    train_users = set(np.unique(bundle["train/user_id"]).tolist())
    for split in SPLITS:
        uid = bundle[f"{split}/user_id"]
        mid = bundle[f"{split}/movie_id"]
        assert uid.min() >= 0 and uid.max() < n_users, f"{split} uid out of range"
        assert mid.min() >= 0 and mid.max() < n_movies, f"{split} mid out of range"
        for col in ("rating", "y_implicit"):
            assert np.isfinite(bundle[f"{split}/{col}"]).all(), f"{split}/{col} non-finite"
        report[f"{split}_rows"] = float(len(uid))
        if split != "train":
            cold = sum(1 for u in np.unique(uid) if u not in train_users)
            report[f"{split}_cold_start_users"] = float(cold)
    # temporal ordering between splits
    assert bundle["train/timestamp"].max() <= bundle["val/timestamp"].min()
    assert bundle["val/timestamp"].max() <= bundle["test/timestamp"].min()
    return report


def save_bundle(bundle: Dict[str, np.ndarray], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **bundle)


def load_bundle(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def run(
    data_dir: str,
    output_path: str,
    implicit_threshold: float = 4.0,
    synthetic_ratings: Optional[int] = None,
    synthetic_seed: int = 1,
) -> Dict[str, np.ndarray]:
    """End-to-end: load raw -> pipeline -> QA -> save. CLI entry parity
    with ``src/preprocessing.py:189-222``."""
    raw = load_movielens_data(
        data_dir, synthetic_ratings=synthetic_ratings, synthetic_seed=synthetic_seed
    )
    bundle = preprocessing_pipeline(
        raw["ratings"], raw["movies"], raw["users"],
        implicit_threshold=implicit_threshold,
    )
    report = check_preprocessing_quality(bundle)
    logger.info("preprocessing QA: %s", json.dumps(report))
    save_bundle(bundle, output_path)
    logger.info("saved bundle -> %s", output_path)
    return bundle
