"""Test env: force an 8-device CPU mesh before JAX initializes
(SURVEY §4 — multi-host-without-a-cluster testing)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The container's sitecustomize imports jax before this conftest runs, so
# the env var alone is too late — update the already-imported config too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_raw():
    """Tiny deterministic raw MovieLens-shaped frames."""
    import pandas as pd
    from recsys_tpu.data.movielens import synthesize_ratings

    rng = np.random.default_rng(0)
    # sparse like ML-1M: each user touches ~10% of the catalog
    n_users, n_movies = 100, 400
    user_ids = np.arange(1, n_users + 1)
    movie_ids = np.arange(1, n_movies + 1) * 2  # non-contiguous raw ids
    genres = np.array(
        ["Comedy|Drama", "Action", "Drama", "Sci-Fi|Thriller"] * (n_movies // 4)
    )
    ratings = synthesize_ratings(
        user_ids, movie_ids, genres, n_ratings=4000, seed=7
    )
    movies = pd.DataFrame(
        {
            "movie_id": movie_ids,
            "title": [f"Movie {i} ({1980 + i % 30})" for i in movie_ids],
            "genres": genres,
        }
    )
    users = pd.DataFrame(
        {
            "user_id": user_ids,
            "gender": ["M", "F"] * (n_users // 2),
            "age": [1, 18, 25, 35, 45] * (n_users // 5),
            "occupation": rng.integers(0, 20, n_users),
            "zip": ["00000"] * n_users,
        }
    )
    return {"ratings": ratings, "movies": movies, "users": users}


@pytest.fixture(scope="session")
def tiny_bundle(tiny_raw):
    from recsys_tpu.data.preprocessing import preprocessing_pipeline

    return preprocessing_pipeline(
        tiny_raw["ratings"], tiny_raw["movies"], tiny_raw["users"]
    )
