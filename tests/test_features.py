"""Feature-engineering tests: hand-checked group stats, leakage
freedom, genre-preference semantics, scaler parity."""

import numpy as np
import pytest

from recsys_tpu.data.features import (
    FeatureEngineer, StandardScaler, _group_stats, make_engineer,
    side_tables_from_bundle,
)


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


def test_log_pop_match_reference_semantics():
    """user_popularity_match = |log1p(user_count) - log1p(item_count)|
    (reference src/data_processing.py:180-184)."""
    uid = np.array([0, 0, 0, 1])
    mid = np.array([0, 1, 2, 0])
    rating = np.array([4.0, 3.0, 5.0, 2.0])
    ts = np.linspace(1e9, 1e9 + 1e6, 4)
    fe = FeatureEngineer(2, 3, standardize=False).fit(uid, mid, rating, ts)
    f = fe.transform(np.array([0, 1]), np.array([0, 1]), np.array([1e9, 1e9]))
    pi = fe.feature_names().index("log_pop_match")
    # user 0 has 3 ratings, item 0 has 2 -> |log1p(3) - log1p(2)|
    np.testing.assert_allclose(f[0, pi], abs(np.log1p(3) - np.log1p(2)), rtol=1e-6)
    # user 1 has 1 rating, item 1 has 1 -> 0
    np.testing.assert_allclose(f[1, pi], 0.0, atol=1e-12)


def test_external_side_tables_change_n_features(tiny_bundle):
    """C5 external-feature merge (src/data_processing.py:243-258): side
    tables appear as named columns, widen the matrix, and round-trip
    through state_dict/from_state."""
    n_users = int(tiny_bundle["meta/n_users"])
    n_items = int(tiny_bundle["meta/n_movies"])
    rng = np.random.default_rng(0)
    user_side = rng.normal(size=(n_users, 2))
    item_side = rng.normal(size=(n_items, 1))
    fe = FeatureEngineer(
        n_users, n_items, item_genres=tiny_bundle["meta/movie_genres"],
        user_side=user_side, item_side=item_side,
        user_side_names=["u_a", "u_b"], item_side_names=["i_a"],
    )
    base = FeatureEngineer.n_features(with_genres=True)
    assert FeatureEngineer.n_features(True, 2, 1) == base + 3
    feats = fe.fit_transform_splits(tiny_bundle)
    assert feats["train"].shape[1] == base + 3
    names = fe.feature_names()
    assert names[-3:] == ["u_a", "u_b", "i_a"]
    # the side column is the id-gathered table value (pre-standardize)
    fe_raw = FeatureEngineer(
        n_users, n_items, standardize=False,
        user_side=user_side, item_side=item_side,
    ).fit(tiny_bundle["train/user_id"], tiny_bundle["train/movie_id"],
          tiny_bundle["train/rating"],
          tiny_bundle["train/timestamp"].astype(np.float64))
    u = tiny_bundle["val/user_id"][:5]
    m = tiny_bundle["val/movie_id"][:5]
    f = fe_raw.transform(u, m, tiny_bundle["val/timestamp"][:5].astype(np.float64))
    ui = fe_raw.feature_names().index("user_ext_0")
    np.testing.assert_allclose(f[:, ui], user_side[u, 0], rtol=1e-6)
    # state round-trip keeps the side tables
    fe2 = FeatureEngineer.from_state(fe.state_dict())
    f_a = fe.transform_scaled(u, m, tiny_bundle["val/timestamp"][:5].astype(np.float64))
    f_b = fe2.transform_scaled(u, m, tiny_bundle["val/timestamp"][:5].astype(np.float64))
    np.testing.assert_allclose(f_a, f_b, atol=1e-7)


def test_state_version_mismatch_raises(tiny_bundle):
    fe = FeatureEngineer(int(tiny_bundle["meta/n_users"]),
                         int(tiny_bundle["meta/n_movies"]))
    fe.fit_transform_splits(tiny_bundle)
    state = fe.state_dict()
    state["version"] = np.int64(1)
    with pytest.raises(ValueError, match="version"):
        FeatureEngineer.from_state(state)


def test_make_engineer_width_check(tiny_bundle):
    base = FeatureEngineer.n_features(with_genres=True)
    eng = make_engineer(tiny_bundle, base)
    assert eng.user_side is None
    u_side, i_side, _, _ = side_tables_from_bundle(tiny_bundle)
    if u_side is not None:
        wide = FeatureEngineer.n_features(True, u_side.shape[1], i_side.shape[1])
        eng2 = make_engineer(tiny_bundle, wide)
        assert eng2.user_side is not None
    with pytest.raises(ValueError, match="dense_features"):
        make_engineer(tiny_bundle, base + 1000)
