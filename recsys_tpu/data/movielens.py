"""MovieLens-1M raw data: parsing + deterministic synthetic ratings.

Parser parity with ``load_movielens_data`` (``src/preprocessing.py:145-186``):
``::``-separated files, ``ratings[user_id, movie_id, rating, timestamp]``,
``movies[movie_id, title, genres]`` in latin-1, ``users[user_id, gender,
age, occupation, zip]``.

The mounted reference's ``ratings.dat`` is a stripped git-LFS blob
(``.MISSING_LARGE_BLOBS``), so this module also provides
:func:`synthesize_ratings` — a deterministic latent-factor generator with
the same schema and similar marginals (power-law user activity, skewed
item popularity, ~58%% ratings >= 4) so quality metrics are meaningful.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

GENRES = [
    "Action", "Adventure", "Animation", "Children's", "Comedy", "Crime",
    "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "Musical",
    "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
]


def _read_dat(path: str, names, encoding="latin-1") -> pd.DataFrame:
    return pd.read_csv(
        path, sep="::", engine="python", names=names, encoding=encoding, header=None
    )


def load_movielens_data(
    data_dir: str,
    synthetic_ratings: Optional[int] = None,
    synthetic_seed: int = 1,
) -> Dict[str, pd.DataFrame]:
    """Load movies/users ``.dat``; load ``ratings.dat`` if real, else
    synthesize (``synthetic_ratings`` rows, default 1,000,209)."""
    movies = _read_dat(
        os.path.join(data_dir, "movies.dat"), ["movie_id", "title", "genres"]
    )
    users = _read_dat(
        os.path.join(data_dir, "users.dat"),
        ["user_id", "gender", "age", "occupation", "zip"],
    )
    ratings_path = os.path.join(data_dir, "ratings.dat")
    real = os.path.exists(ratings_path) and os.path.getsize(ratings_path) > 1_000_000
    if real:
        # native C++ parser on the 1M-row hot path (pandas fallback inside)
        from recsys_tpu.utils.native import parse_ratings_dat

        u, m, r, t = parse_ratings_dat(ratings_path)
        ratings = pd.DataFrame(
            {"user_id": u, "movie_id": m, "rating": r, "timestamp": t}
        )
        logger.info("loaded real ratings.dat: %d rows", len(ratings))
    else:
        if synthetic_ratings is None:
            # single source of truth for the default synthetic size
            from recsys_tpu.config import DataConfig

            synthetic_ratings = DataConfig().synthetic_num_ratings
        n = synthetic_ratings
        ratings = synthesize_ratings(
            users["user_id"].to_numpy(),
            movies["movie_id"].to_numpy(),
            movies["genres"].to_numpy(),
            n_ratings=n,
            seed=synthetic_seed,
        )
        logger.info("ratings.dat missing/stripped -> synthesized %d rows", len(ratings))
    return {"ratings": ratings, "movies": movies, "users": users}


AFFINITY_WEIGHT = 3.0
POPULARITY_WEIGHT = 1.0


def latent_preference_model(
    user_ids: np.ndarray,
    movie_ids: np.ndarray,
    movie_genres: np.ndarray,
    seed: int = 1,
    latent_dim: int = 24,
):
    """The generator's ground-truth preference model: returns
    ``(U, V, log_pop, scale)`` such that a user's choice logits over the
    catalog are ``AFFINITY_WEIGHT*scale*(U[u] @ V.T) +
    POPULARITY_WEIGHT*log_pop``. Exposed so ``benchmarks/oracle.py`` can
    compute the *oracle ceiling* — the recall an ideal model would get —
    which is what trained-model quality is reported against."""
    rng = np.random.default_rng(seed)
    n_users, n_items = len(user_ids), len(movie_ids)
    gidx = {g: i for i, g in enumerate(GENRES)}
    genre_mh = np.zeros((n_items, len(GENRES)), np.float32)
    for r, gs in enumerate(movie_genres):
        for g in str(gs).split("|"):
            if g in gidx:
                genre_mh[r, gidx[g]] = 1.0
    genre_mh /= np.maximum(genre_mh.sum(1, keepdims=True), 1.0)

    U = rng.normal(0, 1, (n_users, latent_dim)).astype(np.float32)
    V = rng.normal(0, 1, (n_items, latent_dim)).astype(np.float32)
    G = rng.normal(0, 1, (len(GENRES), latent_dim)).astype(np.float32)
    V = 0.7 * V + 0.9 * (genre_mh @ G)  # genre-structured item factors
    pop = rng.lognormal(0.0, 1.1, n_items).astype(np.float32)
    return U, V, np.log(pop), 1.0 / np.sqrt(latent_dim), rng, genre_mh


def synthesize_ratings(
    user_ids: np.ndarray,
    movie_ids: np.ndarray,
    movie_genres: np.ndarray,
    n_ratings: int = 1_000_209,
    seed: int = 1,
    latent_dim: int = 24,
) -> pd.DataFrame:
    """Deterministic latent-factor rating generator.

    Users/items get latent vectors; items additionally share genre
    factors (so genre-preference features in the data layer carry real
    signal) and a log-normal popularity bias. Per user: activity count
    from a power law (min 20, like ML-1M), items sampled without
    replacement via Gumbel top-k on (affinity + popularity), ratings
    from the standardized affinity + noise, timestamps increasing per
    user inside the ML-1M window (2000-04 .. 2003-02).
    """
    U, V, log_pop, lat_scale, rng, _ = latent_preference_model(
        user_ids, movie_ids, movie_genres, seed, latent_dim
    )
    n_users, n_items = len(user_ids), len(movie_ids)

    # power-law activity, min 20, scaled to ~n_ratings total
    act = np.maximum(rng.pareto(1.3, n_users) * 25, 20.0)
    act = (act / act.sum() * n_ratings).astype(np.int64)
    act = np.clip(act, min(20, n_items), n_items)

    t0, t1 = 956_703_932, 1_046_454_590  # ML-1M timestamp window
    user_start = rng.integers(t0, t1 - 40_000_000, n_users)

    rows_u, rows_m, rows_r, rows_t = [], [], [], []
    scale = lat_scale
    for u0 in range(0, n_users, 512):
        u1 = min(u0 + 512, n_users)
        aff = (U[u0:u1] @ V.T) * scale  # [b, n_items]
        # sharpness calibrated for ML-1M-like difficulty; NOTE:
        # without-replacement sampling means an UNMASKED oracle is
        # near-random — evaluation should filter seen items
        # (EvalConfig.filter_seen) for meaningful retrieval numbers
        logits = AFFINITY_WEIGHT * aff + POPULARITY_WEIGHT * log_pop[None, :]
        gumbel = rng.gumbel(0, 1, logits.shape).astype(np.float32)
        order = np.argsort(-(logits + gumbel), axis=1)
        for i in range(u1 - u0):
            n_u = act[u0 + i]
            picked = order[i, :n_u]
            a = aff[i, picked]
            r = np.clip(np.round(3.55 + 0.85 * a + rng.normal(0, 0.9, n_u)), 1, 5)
            ts = np.sort(
                user_start[u0 + i]
                + rng.exponential(3e5, n_u).cumsum().astype(np.int64)
            )
            rows_u.append(np.full(n_u, user_ids[u0 + i], np.int64))
            rows_m.append(movie_ids[picked])
            rows_r.append(r.astype(np.int64))
            rows_t.append(np.minimum(ts, t1))

    df = pd.DataFrame(
        {
            "user_id": np.concatenate(rows_u),
            "movie_id": np.concatenate(rows_m),
            "rating": np.concatenate(rows_r),
            "timestamp": np.concatenate(rows_t),
        }
    )
    logger.info(
        "synthetic ratings: %d rows, %.1f%% positive(>=4)",
        len(df), 100.0 * (df["rating"] >= 4).mean(),
    )
    return df
