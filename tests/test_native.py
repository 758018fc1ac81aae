"""Native C++ component tests: parser vs pandas, topk vs numpy."""

import numpy as np
import pytest

from recsys_tpu.utils import native


def test_native_builds():
    assert native.native_available(), "g++ toolchain present but build failed"


def test_parse_ratings_dat(tmp_path):
    p = tmp_path / "ratings.dat"
    p.write_text("1::1193::5::978300760\n1::661::3::978302109\n2::110::4.5::978301968\n")
    u, m, r, t = native.parse_ratings_dat(str(p))
    np.testing.assert_array_equal(u, [1, 1, 2])
    np.testing.assert_array_equal(m, [1193, 661, 110])
    np.testing.assert_allclose(r, [5.0, 3.0, 4.5])
    np.testing.assert_array_equal(t, [978300760, 978302109, 978301968])


def test_parse_skips_malformed(tmp_path):
    p = tmp_path / "ratings.dat"
    p.write_text("1::2::3::4\ngarbage line\n5::6::7::8\n")
    u, m, r, t = native.parse_ratings_dat(str(p))
    np.testing.assert_array_equal(u, [1, 5])


def test_parse_large_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 50_000
    users = rng.integers(1, 6041, n)
    movies = rng.integers(1, 3953, n)
    ratings = rng.integers(1, 6, n)
    ts = rng.integers(9e8, 1e9, n)
    lines = "\n".join(
        f"{u}::{m}::{r}::{t}" for u, m, r, t in zip(users, movies, ratings, ts)
    )
    p = tmp_path / "big.dat"
    p.write_text(lines)
    u, m, r, t = native.parse_ratings_dat(str(p))
    assert len(u) == n
    np.testing.assert_array_equal(u, users)
    np.testing.assert_array_equal(m, movies)
    np.testing.assert_allclose(r, ratings)
    np.testing.assert_array_equal(t, ts)


def test_topk_dot_vs_numpy():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(7, 32)).astype(np.float32)
    items = rng.normal(size=(500, 32)).astype(np.float32)
    s, i = native.topk_dot(q, items, 9)
    dense = q @ items.T
    ref_i = np.argsort(-dense, axis=1)[:, :9]
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, np.take_along_axis(dense, ref_i, 1), rtol=1e-5)


def test_topk_dot_with_bias():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    items = rng.normal(size=(100, 16)).astype(np.float32)
    bias = rng.normal(size=100).astype(np.float32) * 5
    s, i = native.topk_dot(q, items, 5, bias=bias)
    dense = q @ items.T + bias[None, :]
    ref_i = np.argsort(-dense, axis=1)[:, :5]
    np.testing.assert_array_equal(i, ref_i)


def test_topk_k_larger_than_n():
    q = np.ones((2, 4), np.float32)
    items = np.eye(4, dtype=np.float32)[:3]
    s, i = native.topk_dot(q, items, 10)
    assert s.shape == (2, 3)


def test_gather_batch_exact_and_fallback():
    """The threaded C++ batch gather must be bit-identical to NumPy
    fancy indexing for every dtype/width the pipeline ships (int32,
    int64, float32, float64, 2-D dense blocks), including duplicate and
    boundary indices; the no-library fallback is the same expression."""
    import numpy as np

    from recsys_tpu.utils import native as nat

    rng = np.random.default_rng(3)
    n = 5000
    cols = {
        "i32": rng.integers(0, 99, n).astype(np.int32),
        "i64": rng.integers(0, 99, n).astype(np.int64),
        "f32": rng.normal(size=n).astype(np.float32),
        "f64": rng.normal(size=n),
        "wide": rng.normal(size=(n, 29)).astype(np.float32),
    }
    idx = np.concatenate([
        rng.integers(0, n, 500), [0, 0, n - 1, n - 1, 7, 7]
    ]).astype(np.int64)
    out = nat.gather_batch(cols, idx)
    for k, v in cols.items():
        np.testing.assert_array_equal(out[k], v[idx])
        assert out[k].dtype == v.dtype

    # fallback path (library forced away) gives the same arrays
    lib, tried = nat._lib, nat._lib_tried
    try:
        nat._lib, nat._lib_tried = None, True
        fb = nat.gather_batch(cols, idx)
    finally:
        nat._lib, nat._lib_tried = lib, tried
    for k in cols:
        np.testing.assert_array_equal(out[k], fb[k])


def test_batcher_uses_native_gather(tiny_bundle):
    """Batcher epochs are identical whether the native gather or the
    NumPy path materializes them (the trainer's streaming input)."""
    import numpy as np

    from recsys_tpu.data.pipeline import Batcher
    from recsys_tpu.utils import native as nat

    def run_epoch():
        b = Batcher(tiny_bundle, "train", 256, seed=9)
        return list(b.epoch(0))

    with_native = run_epoch()
    lib, tried = nat._lib, nat._lib_tried
    try:
        nat._lib, nat._lib_tried = None, True
        without = run_epoch()
    finally:
        nat._lib, nat._lib_tried = lib, tried
    assert len(with_native) == len(without) > 0
    for a, b in zip(with_native, without):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_gather_batch_rejects_out_of_range():
    """The C++ gather trusts its indices; the wrapper must refuse
    out-of-range ones instead of reading out of bounds."""
    import numpy as np
    import pytest

    from recsys_tpu.utils.native import gather_batch

    cols = {"a": np.arange(10, dtype=np.float32)}
    with pytest.raises(ValueError, match="out of range"):
        gather_batch(cols, np.array([0, 10]))
    with pytest.raises(ValueError, match="out of range"):
        gather_batch(cols, np.array([-1, 3]))
