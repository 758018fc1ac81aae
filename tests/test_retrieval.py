"""Retrieval-layer tests: metric golden numbers, scorer vs numpy,
index round-trip, sharded top-k equivalence."""

import jax.numpy as jnp
import numpy as np

from recsys_tpu.config import ModelConfig
from recsys_tpu.models.towers import TwoTower
from recsys_tpu.parallel.mesh import make_mesh
from recsys_tpu.retrieval.metrics import RankingMetrics
from recsys_tpu.retrieval.scorer import (
    RetrievalIndex,
    l2_normalize,
    make_sharded_topk,
    materialize_item_embeddings,
    topk_scores,
)


def test_metrics_golden():
    preds = np.array([
        [1, 2, 3],   # truth 2 at rank 1
        [4, 5, 6],   # truth 9 -> miss
        [7, 8, 9],   # truth 7 at rank 0
    ])
    truth = np.array([2, 9, 7])
    assert RankingMetrics.recall_at_k(preds, truth, 3) == 2 / 3
    assert RankingMetrics.recall_at_k(preds, truth, 1) == 1 / 3
    np.testing.assert_allclose(
        RankingMetrics.precision_at_k(preds, truth, 3), (2 / 3) / 3
    )
    # ndcg: (1/log2(3) + 0 + 1/log2(2)) / 3
    np.testing.assert_allclose(
        RankingMetrics.ndcg_at_k(preds, truth, 3),
        (1 / np.log2(3) + 1.0) / 3,
    )
    np.testing.assert_allclose(
        RankingMetrics.map_at_k(preds, truth, 3), (0.5 + 0 + 1.0) / 3
    )
    np.testing.assert_allclose(RankingMetrics.mrr(preds, truth), (0.5 + 0 + 1.0) / 3)
    assert RankingMetrics.coverage(preds, 18) == 0.5
    assert RankingMetrics.diversity(preds) == 1.0
    rep = RankingMetrics.full_report(preds, truth, topk=(1, 3), catalog_size=18)
    assert set(rep) >= {"recall@1", "ndcg@3", "map@1", "mrr", "coverage"}


def test_topk_scores_vs_numpy():
    rng = np.random.default_rng(1)
    u = rng.normal(size=(6, 8)).astype(np.float32)
    v = rng.normal(size=(30, 8)).astype(np.float32)
    s, i = topk_scores(jnp.asarray(u), jnp.asarray(v), 4, normalize=True)
    un = u / np.linalg.norm(u, axis=1, keepdims=True)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    dense = un @ vn.T
    ref_i = np.argsort(-dense, axis=1)[:, :4]
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(dense, ref_i, 1), rtol=1e-5
    )


def test_materialize_and_index_roundtrip(tmp_path):
    cfg = ModelConfig(embedding_dim=16, mixed_precision=False)
    import jax

    params = TwoTower.init(jax.random.PRNGKey(0), cfg, 10, 37)
    embs = materialize_item_embeddings(params, cfg, 37, batch=16)
    assert embs.shape == (37, 16)
    # matches direct tower application
    direct = TwoTower.item_embed(params, jnp.arange(37), cfg)
    np.testing.assert_allclose(np.asarray(embs), np.asarray(direct), rtol=1e-5)

    idx = RetrievalIndex(np.asarray(embs), np.arange(100, 137))
    p = str(tmp_path / "index.npz")
    idx.save(p)
    idx2 = RetrievalIndex.load(p)
    u = TwoTower.user_embed(params, jnp.arange(3), cfg)
    s1, i1 = idx.search(u, 5)
    s2, i2 = idx2.search(u, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    # raw-dot path differs from cosine path (the /score contract)
    raw = idx.raw_dot_scores(u, np.array([0, 1]))
    assert raw.shape == (3, 2)


def test_sharded_topk_matches_single_device():
    ctx = make_mesh(model_parallel=4)
    rng = np.random.default_rng(2)
    q, n, d, k = 8, 64, 16, 6
    users = rng.normal(size=(q, d)).astype(np.float32)
    items = rng.normal(size=(n, d)).astype(np.float32)
    sharded = make_sharded_topk(ctx, k, normalize=True)
    s_sh, i_sh = sharded(jnp.asarray(users), jnp.asarray(items))
    s_ref, i_ref = topk_scores(jnp.asarray(users), jnp.asarray(items), k)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_ref))


def test_sharded_index_matches_dense():
    """ShardedIndex (catalog row-sharded over the model axis, padded to
    a shard multiple, masked) returns exactly the dense single-device
    top-k — including k larger than one shard's row count."""
    import jax.numpy as jnp

    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.retrieval.scorer import RetrievalIndex, topk_scores

    rng = np.random.default_rng(0)
    # 77 rows over 4 shards -> padded to 80 with 3 masked pad rows
    idx = RetrievalIndex(
        rng.normal(size=(77, 16)).astype(np.float32), np.arange(77)
    )
    ctx = make_mesh(model_parallel=4)
    sh = idx.shard(ctx)
    q = rng.normal(size=(5, 16)).astype(np.float32)
    for k in (10, 25):  # 25 > 20 rows/shard
        s_sh, i_sh = sh.search(q, k)
        s_d, i_d = topk_scores(jnp.asarray(q), idx.item_embeddings, k)
        assert np.allclose(s_sh, np.asarray(s_d), atol=1e-5)
        assert (i_sh == np.asarray(i_d)).all()
        assert (i_sh < 77).all()  # pad rows never surface


def test_sharded_index_int8():
    """ShardedIndex(int8=True): quantized shards + mask on the mesh
    match the single-device int8 path, and closely match dense f32."""
    import jax.numpy as jnp

    from recsys_tpu.ops.topk import blockwise_topk_int8, quantize_rows
    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.retrieval.scorer import (
        RetrievalIndex, l2_normalize, topk_scores,
    )

    rng = np.random.default_rng(5)
    idx = RetrievalIndex(
        rng.normal(size=(77, 32)).astype(np.float32), np.arange(77)
    )
    from recsys_tpu.retrieval.scorer import ShardedIndex

    ctx = make_mesh(model_parallel=4)
    sh8 = ShardedIndex(idx, ctx, int8=True)
    q = rng.normal(size=(6, 32)).astype(np.float32)
    s8, i8 = sh8.search(q, 10)
    assert (i8 < 77).all()

    # reference: single-device int8 over the same normalized rows
    items_n = l2_normalize(jnp.asarray(idx.item_embeddings_np))
    iq, isc = quantize_rows(items_n)
    u_n = l2_normalize(jnp.asarray(q))
    s_ref, i_ref = blockwise_topk_int8(u_n, iq, isc, 10, block_size=64,
                                       approx=False)
    assert np.allclose(s8, np.asarray(s_ref), atol=1e-5)
    assert (i8 == np.asarray(i_ref)).all()

    # and close to dense f32
    s_f, i_f = topk_scores(jnp.asarray(q), idx.item_embeddings, 10)
    overlap = np.mean([
        len(set(i8[r]) & set(np.asarray(i_f)[r])) / 10 for r in range(6)
    ])
    assert overlap >= 0.9


def test_index_search_flash_matches_exact():
    """RetrievalIndex.search(flash=True) (Pallas running-top-k,
    interpret mode on CPU) returns the same answer as the dense exact
    path; bf16 score rounding only (catalog here is tiny)."""
    rng = np.random.default_rng(9)
    embs = rng.standard_normal((300, 32)).astype(np.float32)
    idx = RetrievalIndex(embs, np.arange(300))
    u = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    s_ref, i_ref = idx.search(u, 10)
    s_fl, i_fl = idx.search(u, 10, flash=True)
    # bf16 score rounding may swap near-tied neighbors WITHIN the
    # top-k; the retrieved set and the scores must still agree
    for row_fl, row_ref in zip(i_fl, i_ref):
        assert set(row_fl) == set(row_ref)
    np.testing.assert_allclose(s_fl, s_ref, atol=5e-3)
