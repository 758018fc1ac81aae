"""Hot-op tests: Pallas DCN kernel equivalence (interpret mode on CPU),
blockwise and ring top-k vs the dense scorer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.ops.pallas.dcn_cross import dcn_cross_fused, dcn_cross_reference
from recsys_tpu.ops.topk import blockwise_topk, make_ring_topk
from recsys_tpu.parallel.mesh import make_mesh
from recsys_tpu.parallel.sharding import batch_sharding, rows_sharding
from recsys_tpu.retrieval.scorer import topk_scores


def test_dcn_cross_kernel_fwd_bwd():
    rng = np.random.default_rng(0)
    n, d, L = 64, 32, 3
    x0 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(L, d)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(L, d)).astype(np.float32) * 0.1)
    np.testing.assert_allclose(
        np.asarray(dcn_cross_fused(x0, w, b)),
        np.asarray(dcn_cross_reference(x0, w, b)),
        atol=1e-4,
    )
    g = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    ga = jax.grad(lambda *a: jnp.sum(dcn_cross_fused(*a) * g), argnums=(0, 1, 2))(x0, w, b)
    gr = jax.grad(lambda *a: jnp.sum(dcn_cross_reference(*a) * g), argnums=(0, 1, 2))(x0, w, b)
    for a, r in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-3)


def test_dcn_cross_kernel_dense_feature_width():
    """Dense-features models feed the DCN a non-power-of-two x0 width
    (2*embedding_dim + n_features, e.g. 285): the fused kernel must
    match XLA at arbitrary widths, multi-tile grids included. Error
    tolerance is relative to the gradient's own scale (fp32 reduction
    order differs between the kernel's per-tile accumulation and XLA)."""
    rng = np.random.default_rng(2)
    n, d, L = 96, 285, 3  # 96 -> 3 tiles of 32
    x0 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(L, d)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(L, d)).astype(np.float32) * 0.1)
    f = np.asarray(dcn_cross_fused(x0, w, b))
    r = np.asarray(dcn_cross_reference(x0, w, b))
    np.testing.assert_allclose(f, r, atol=1e-4 * max(np.abs(r).max(), 1.0))
    ga = jax.grad(lambda *a: jnp.sum(dcn_cross_fused(*a) ** 2),
                  argnums=(0, 1, 2))(x0, w, b)
    gr = jax.grad(lambda *a: jnp.sum(dcn_cross_reference(*a) ** 2),
                  argnums=(0, 1, 2))(x0, w, b)
    for a, rr in zip(ga, gr):
        scale = max(float(np.abs(np.asarray(rr)).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(rr), atol=1e-5 * scale,
        )


@pytest.mark.parametrize("n_items,block", [(100, 32), (256, 64), (64, 64), (50, 64)])
def test_blockwise_topk_matches_dense(n_items, block):
    rng = np.random.default_rng(1)
    q, d, k = 8, 16, 7
    u = jnp.asarray(rng.normal(size=(q, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n_items, d)).astype(np.float32))
    s_blk, i_blk = blockwise_topk(u, v, k, block_size=block)
    s_ref, i_ref = topk_scores(u, v, k, normalize=True)
    np.testing.assert_allclose(np.asarray(s_blk), np.asarray(s_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_blk), np.asarray(i_ref))


def test_blockwise_topk_approx_high_recall():
    """approx=True (bf16 + per-block approx_max_k) must recover almost
    all of the exact top-k set; the cross-block merge is exact."""
    rng = np.random.default_rng(3)
    q, n, d, k = 16, 4096, 32, 10
    u = jnp.asarray(rng.normal(size=(q, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    _, i_apx = blockwise_topk(u, v, k, block_size=512, approx=True)
    _, i_ref = topk_scores(u, v, k, normalize=True)
    i_apx, i_ref = np.asarray(i_apx), np.asarray(i_ref)
    recall = np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(i_apx, i_ref)]
    )
    assert recall >= 0.9, recall


def test_ring_topk_matches_dense():
    ctx = make_mesh(model_parallel=4)
    rng = np.random.default_rng(2)
    q, n, d, k = 8, 64, 16, 6
    u = rng.normal(size=(q, d)).astype(np.float32)
    v = rng.normal(size=(n, d)).astype(np.float32)
    ring = make_ring_topk(ctx, k)
    u_dev = jax.device_put(u, batch_sharding(ctx, 2))
    v_dev = jax.device_put(v, rows_sharding(ctx))
    s_ring, i_ring = ring(u_dev, v_dev)
    s_ref, i_ref = topk_scores(jnp.asarray(u), jnp.asarray(v), k)
    np.testing.assert_allclose(np.asarray(s_ring), np.asarray(s_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_ring), np.asarray(i_ref))


def test_ring_topk_unnormalized():
    ctx = make_mesh(model_parallel=8)
    rng = np.random.default_rng(3)
    q, n, d, k = 4, 32, 8, 3
    u = rng.normal(size=(q, d)).astype(np.float32)
    v = rng.normal(size=(n, d)).astype(np.float32)
    ring = make_ring_topk(ctx, k, normalize=False)
    s_ring, i_ring = ring(
        jax.device_put(u, batch_sharding(ctx, 2)),
        jax.device_put(v, rows_sharding(ctx)),
    )
    dense = u @ v.T
    ref_i = np.argsort(-dense, 1)[:, :k]
    np.testing.assert_array_equal(np.asarray(i_ring), ref_i)


def test_dcn_apply_pallas_flag_matches_xla():
    """DCN.apply with use_pallas_dcn must match the XLA path."""
    import dataclasses

    from recsys_tpu.config import ModelConfig
    from recsys_tpu.models.dcn import DeepCrossNetwork

    cfg = ModelConfig(embedding_dim=16, cross_layers=3, dnn_dims=(16,),
                      dropout_rate=0.0, mixed_precision=False)
    cfg_pl = dataclasses.replace(cfg, use_pallas_dcn=True)
    rng = np.random.default_rng(4)
    params = DeepCrossNetwork.init(jax.random.PRNGKey(0), cfg, 32)
    x = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    out_xla = DeepCrossNetwork.apply(params, x, cfg)
    out_pl = DeepCrossNetwork.apply(params, x, cfg_pl)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-4)
    # gradients too
    g_x = jax.grad(lambda p: jnp.sum(DeepCrossNetwork.apply(p, x, cfg) ** 2))(params)
    g_p = jax.grad(lambda p: jnp.sum(DeepCrossNetwork.apply(p, x, cfg_pl) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-2)


def test_int8_blockwise_topk_recall():
    """int8-quantized blockwise top-k: near-exact recall vs the dense
    f32 scorer, scores within quantization error."""
    import jax.numpy as jnp

    from recsys_tpu.ops.topk import blockwise_topk_int8, quantize_rows
    from recsys_tpu.retrieval.scorer import l2_normalize, topk_scores

    rng = np.random.default_rng(1)
    n, d, q, k = 5000, 32, 16, 10
    items = rng.normal(size=(n, d)).astype(np.float32)
    users = rng.normal(size=(q, d)).astype(np.float32)

    items_n = np.asarray(l2_normalize(jnp.asarray(items)))
    users_n = np.asarray(l2_normalize(jnp.asarray(users)))
    iq, isc = quantize_rows(jnp.asarray(items_n))
    # dequantization error bound: |q*scale - x| <= scale/2 per element
    assert np.max(np.abs(np.asarray(iq) * np.asarray(isc)[:, None] - items_n)) \
        <= float(np.max(isc)) / 2 + 1e-6

    s8, i8 = blockwise_topk_int8(
        jnp.asarray(users_n), iq, isc, k, block_size=1024, approx=False
    )
    s_ref, i_ref = topk_scores(jnp.asarray(users), jnp.asarray(items), k)
    overlap = np.mean([
        len(set(np.asarray(i8)[r]) & set(np.asarray(i_ref)[r])) / k
        for r in range(q)
    ])
    assert overlap >= 0.9, f"int8 top-{k} overlap {overlap}"
    assert np.allclose(np.asarray(s8)[:, 0], np.asarray(s_ref)[:, 0], atol=0.02)


def test_int8_index_search():
    """RetrievalIndex.search(int8=True) end-to-end (lazy quantization,
    normalization carried into the quantized rows)."""
    from recsys_tpu.retrieval.scorer import RetrievalIndex

    rng = np.random.default_rng(2)
    idx = RetrievalIndex(
        rng.normal(size=(3000, 16)).astype(np.float32), np.arange(3000)
    )
    u = rng.normal(size=(4, 16)).astype(np.float32)
    s8, i8 = idx.search(u, 10, int8=True)
    s, i = idx.search(u, 10)
    overlap = np.mean([
        len(set(i8[r]) & set(i[r])) / 10 for r in range(4)
    ])
    assert overlap >= 0.9
    assert s8.shape == (4, 10) and (i8 < 3000).all()


def test_int8_refine_recovers_exact_topk():
    """int8 scan + f32 refine (refine_factor) returns the exact top-k
    whenever the true top-k survives the candidate pass."""
    from recsys_tpu.retrieval.scorer import RetrievalIndex

    rng = np.random.default_rng(3)
    idx = RetrievalIndex(
        rng.normal(size=(3000, 16)).astype(np.float32), np.arange(3000)
    )
    u = rng.normal(size=(8, 16)).astype(np.float32)
    s_r, i_r = idx.search(u, 10, int8=True, refine_factor=8)
    s, i = idx.search(u, 10)
    overlap = np.mean([len(set(i_r[r]) & set(i[r])) / 10 for r in range(8)])
    assert overlap >= 0.99
    assert np.allclose(s_r, s, atol=1e-5)


import os as _os
import subprocess as _subprocess
import sys as _sys

import pytest as _pytest


@_pytest.mark.skipif(
    _os.environ.get("RECSYS_TPU_KERNEL_TEST") != "1",
    reason="compiled-kernel hardware check: set RECSYS_TPU_KERNEL_TEST=1 "
           "with an accelerator attached (CI runs the kernels in "
           "interpret mode on the CPU mesh only)",
)
def test_kernels_compiled_on_accelerator():
    """Runs benchmarks/kernel_check.py in a FRESH process (so the
    conftest's forced-CPU platform doesn't apply) — the real Mosaic
    lowerings of every Pallas kernel, checked against the XLA paths on
    whatever accelerator is live."""
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    env = {k: v for k, v in _os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = _subprocess.run(
        [_sys.executable, _os.path.join(repo, "benchmarks", "kernel_check.py")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=900,
    )
    assert out.returncode == 0, out.stdout + out.stderr


# ---- flash exact top-k (Pallas) ------------------------------------------

def _flash_topk(*a, **kw):
    from recsys_tpu.ops.pallas.topk_flash import flash_topk
    return flash_topk(*a, **kw)


@_pytest.mark.parametrize("n_items,k", [(400, 10), (301, 7)])
def test_flash_topk_matches_blockwise_exact(n_items, k):
    """Pallas running-top-k (interpret mode) vs the XLA blockwise exact
    path, f32 scoring: identical scores, identical ids (scores are
    continuous random floats, so ties have measure zero)."""
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((48, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n_items, 32)).astype(np.float32))
    fs, fi = _flash_topk(u, v, k, bf16=False, block_items=128, q_tile=16)
    bs, bi = blockwise_topk(u, v, k, block_size=128)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(bs), atol=1e-5)
    assert np.array_equal(np.asarray(fi), np.asarray(bi))


def test_flash_topk_gate_is_pure_optimization():
    """The threshold gate skips extraction only when the block cannot
    contribute: gated and ungated runs must be bit-identical."""
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal((16, 24)).astype(np.float32))
    # adversarial ordering: catalog sorted ASCENDING by norm, so late
    # blocks keep beating the buffer (worst case for the gate)
    v = rng.standard_normal((300, 24)).astype(np.float32)
    v = jnp.asarray(v[np.argsort(np.linalg.norm(v, axis=1))])
    a = _flash_topk(u, v, 10, bf16=False, gate=True, block_items=128,
                    q_tile=16, normalize=False)
    b = _flash_topk(u, v, 10, bf16=False, gate=False, block_items=128,
                    q_tile=16, normalize=False)
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_flash_topk_bf16_selects_bf16_exact_topk():
    """bf16=True must be EXACT w.r.t. bf16-rounded scores - compare
    against a dense reference computed at the same precision."""
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((300, 32)).astype(np.float32))
    fs, fi = _flash_topk(u, v, 10, bf16=True, block_items=128, q_tile=16,
                         normalize=False)
    dense = jnp.dot(u.astype(jnp.bfloat16), v.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)
    ds, di = jax.lax.top_k(dense, 10)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(ds), atol=1e-6)
    assert np.array_equal(np.asarray(fi), np.asarray(di))


def test_flash_topk_k_exceeds_catalog():
    """k > N pads with NEG_INF rows, same contract as blockwise_topk."""
    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))
    fs, fi = _flash_topk(u, v, 10, bf16=False, block_items=128, q_tile=16)
    bs, bi = blockwise_topk(u, v, 10, block_size=128)
    np.testing.assert_allclose(np.asarray(fs)[:, :5], np.asarray(bs)[:, :5],
                               atol=1e-5)
    assert np.array_equal(np.asarray(fi)[:, :5], np.asarray(bi)[:, :5])
    assert np.all(np.asarray(fs)[:, 5:] < -1e29)


def test_flash_topk_item_bias_augmentation():
    """item_bias folds into the dot via the [u|1].[v|b] augmentation —
    must match the dense biased raw-dot top-k exactly."""
    import jax.numpy as jnp

    from recsys_tpu.retrieval.scorer import topk_scores

    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(300, 24)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=300).astype(np.float32) * 2.0)
    fs, fi = _flash_topk(u, v, 10, normalize=False, bf16=False,
                         item_bias=bias, block_items=128, q_tile=16)
    rs, ri = topk_scores(u, v, 10, normalize=False, item_bias=bias)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(rs),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(fi), np.asarray(ri))
    with pytest.raises(ValueError):
        _flash_topk(u, v, 10, normalize=True, item_bias=bias)


def test_exact_topk_dispatches_to_flash_past_cap(monkeypatch):
    """exact_topk is the production exact path (VERDICT r3 item 2):
    dense under the cap, the flash kernel past it — same results."""
    from recsys_tpu.retrieval import scorer

    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(200, 16)).astype(np.float32))
    dense_s, dense_i = scorer.topk_scores(u, v, 5)

    # under the cap on CPU: plain dense path
    s, i = scorer.exact_topk(u, v, 5)
    assert np.array_equal(np.asarray(i), np.asarray(dense_i))

    # force the over-cap TPU branch: flash must be taken and agree
    called = {}
    import recsys_tpu.ops.pallas.topk_flash as tf_mod

    real = tf_mod.flash_topk

    def spy(*a, **kw):
        called["flash"] = True
        return real(*a, **kw)

    monkeypatch.setattr(tf_mod, "flash_topk", spy)
    monkeypatch.setattr(scorer, "_on_tpu", lambda: True)
    monkeypatch.setattr(scorer, "_DENSE_SCORES_CAP", 0)
    s2, i2 = scorer.exact_topk(u, v, 5)
    assert called.get("flash")
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s), rtol=1e-5)
    assert np.array_equal(np.asarray(i2), np.asarray(i))

    # k > 128 cannot flash: past the cap it takes the blockwise exact
    # scan (NOT the dense materializing path — the evaluator's
    # over-retrieve branch reaches here with k in the thousands)
    called.clear()

    def boom_dense(*a, **k):
        raise AssertionError("dense topk_scores called past the cap")

    monkeypatch.setattr(scorer, "topk_scores", boom_dense)
    s3, i3 = scorer.exact_topk(u, v, 130)
    assert not called.get("flash")
    assert s3.shape == (8, 130)
    # blockwise result matches dense ordering on the overlap
    assert np.array_equal(np.asarray(i3)[:, :5], np.asarray(dense_i))
