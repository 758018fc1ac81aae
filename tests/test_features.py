"""Feature-engineering tests: hand-checked group stats, leakage
freedom, genre-preference semantics, scaler parity."""

import numpy as np
import pytest

from recsys_tpu.data.features import FeatureEngineer, StandardScaler, _group_stats


def test_group_stats_golden():
    ids = np.array([0, 0, 1, 2, 2, 2])
    vals = np.array([1.0, 3.0, 5.0, 2.0, 4.0, 6.0])
    cnt, mean, std, mn, mx = _group_stats(ids, vals, 4)
    np.testing.assert_array_equal(cnt, [2, 1, 3, 0])
    np.testing.assert_allclose(mean, [2.0, 5.0, 4.0, 0.0])
    np.testing.assert_allclose(std[0], 1.0)
    np.testing.assert_allclose(std[2], np.sqrt(8 / 3), rtol=1e-6)
    np.testing.assert_array_equal(mn, [1.0, 5.0, 2.0, 0.0])
    np.testing.assert_array_equal(mx, [3.0, 5.0, 6.0, 0.0])


def test_scaler_vs_sklearn():
    rng = np.random.default_rng(0)
    x = rng.normal(3, 2, (100, 4))
    ours = StandardScaler().fit(x)
    from sklearn.preprocessing import StandardScaler as SK

    sk = SK().fit(x)
    np.testing.assert_allclose(ours.transform(x), sk.transform(x), atol=1e-9)


def test_feature_matrix_shapes_and_finite(tiny_bundle):
    n_users = int(tiny_bundle["meta/n_users"])
    n_items = int(tiny_bundle["meta/n_movies"])
    fe = FeatureEngineer(n_users, n_items,
                         item_genres=tiny_bundle["meta/movie_genres"])
    feats = fe.fit_transform_splits(tiny_bundle)
    names = fe.feature_names()
    for split in ("train", "val", "test"):
        assert feats[split].shape == (len(tiny_bundle[f"{split}/user_id"]), len(names))
        assert np.isfinite(feats[split]).all()
    # standardized train columns: ~0 mean, <=1-ish std
    # ~0 mean up to fp32 rounding and the deliberate clip of >10σ
    # outliers (clip_std), which shifts heavy-tailed columns slightly
    assert np.abs(feats["train"].mean(0)).max() < 1e-2
    assert "user_genre_match" in names


def test_train_only_statistics_no_leakage(tiny_bundle):
    """Stats must come from train only: mutating the val split must not
    change any engineered feature values of the train split."""
    n_users = int(tiny_bundle["meta/n_users"])
    n_items = int(tiny_bundle["meta/n_movies"])
    fe1 = FeatureEngineer(n_users, n_items, standardize=False)
    f1 = fe1.fit_transform_splits(tiny_bundle)
    mutated = dict(tiny_bundle)
    mutated["val/rating"] = tiny_bundle["val/rating"] * 0 + 5.0
    fe2 = FeatureEngineer(n_users, n_items, standardize=False)
    f2 = fe2.fit_transform_splits(mutated)
    np.testing.assert_array_equal(f1["train"], f2["train"])
    np.testing.assert_array_equal(f1["test"], f2["test"])


def test_genre_preference_semantics():
    """A user who only rates genre-0 items highly must have a higher
    genre-match with a genre-0 item than with a genre-1 item."""
    genres = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])
    uid = np.array([0, 0, 0, 1, 1])
    mid = np.array([0, 1, 2, 2, 3])
    rating = np.array([5.0, 5.0, 1.0, 5.0, 4.0])
    ts = np.linspace(1e9, 1e9 + 1e6, 5)
    fe = FeatureEngineer(2, 4, item_genres=genres, standardize=False).fit(
        uid, mid, rating, ts
    )
    f_genre0 = fe.transform(np.array([0]), np.array([0]), np.array([1e9]))
    f_genre1 = fe.transform(np.array([0]), np.array([2]), np.array([1e9]))
    gi = fe.feature_names().index("user_genre_match")
    assert f_genre0[0, gi] > f_genre1[0, gi]
    # user 1 prefers genre 1
    f1_g1 = fe.transform(np.array([1]), np.array([3]), np.array([1e9]))
    f1_g0 = fe.transform(np.array([1]), np.array([0]), np.array([1e9]))
    assert f1_g1[0, gi] > f1_g0[0, gi]
