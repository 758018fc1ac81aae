"""Mesh + collectives on the forced 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from recsys_tpu.parallel import collectives as coll
from recsys_tpu.parallel.mesh import make_mesh
from recsys_tpu.parallel.sharding import batch_sharding, rows_sharding, shard_batch


def test_mesh_shapes():
    ctx = make_mesh(model_parallel=2)
    assert ctx.n_model == 2 and ctx.n_data == 4 and ctx.n_devices == 8
    assert ctx.local_batch(64) == 16
    with pytest.raises(ValueError):
        ctx.local_batch(10)


def test_shard_batch_placement():
    ctx = make_mesh(model_parallel=1)
    batch = {"x": np.arange(16, dtype=np.int32), "y": np.ones((16, 4), np.float32)}
    placed = shard_batch(ctx, batch)
    assert placed["x"].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(placed["x"]), batch["x"])


def test_allreduce_mean():
    ctx = make_mesh(model_parallel=1)

    def body(x):
        return coll.allreduce_mean({"g": x})["g"]

    f = jax.shard_map(
        body, mesh=ctx.mesh, in_specs=P("data", None), out_specs=P(None, None)
    )
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    out = f(x)
    np.testing.assert_allclose(np.asarray(out), x.reshape(8, 1, 2).mean(0))


def test_exchange_all_to_all():
    """shard i's chunk j ends up on shard j as chunk i."""
    ctx = make_mesh(model_parallel=8)
    n = 8
    cap = 2
    # x[shard, chunk, cap] encoded as shard*100 + chunk
    x = np.zeros((n, n * cap), np.int32)
    for s in range(n):
        for c in range(n):
            x[s, c * cap : (c + 1) * cap] = s * 100 + c

    f = jax.shard_map(
        lambda v: coll.exchange(v[0])[None],
        mesh=ctx.mesh,
        in_specs=P("model", None),
        out_specs=P("model", None),
    )
    out = np.asarray(f(x))
    for s in range(n):
        for c in range(n):
            expect = c * 100 + s  # received from shard c, our index s
            assert (out[s, c * cap : (c + 1) * cap] == expect).all()


def test_merge_topk_matches_dense():
    ctx = make_mesh(model_parallel=8)
    rng = np.random.default_rng(0)
    n_items, d, q, k = 64, 16, 4, 5
    items = rng.normal(size=(n_items, d)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)

    def body(item_shard):
        shard_idx = coll.axis_index("model")
        local_n = item_shard.shape[0]
        scores = queries @ item_shard.T  # [q, local_n]
        s, i = jax.lax.top_k(scores, k)
        gids = i + shard_idx * local_n
        return coll.merge_topk(s, gids, k)

    f = jax.shard_map(
        body, mesh=ctx.mesh, in_specs=P("model", None),
        out_specs=(P(), P()), check_vma=False,
    )
    top_s, top_i = f(items)
    dense = queries @ items.T
    ref_i = np.argsort(-dense, axis=1)[:, :k]
    ref_s = np.take_along_axis(dense, ref_i, axis=1)
    np.testing.assert_allclose(np.asarray(top_s), ref_s, rtol=1e-5)
    np.testing.assert_array_equal(np.sort(top_i, 1), np.sort(ref_i, 1))


def test_ring_shift():
    ctx = make_mesh(model_parallel=8)
    f = jax.shard_map(
        lambda x: coll.ring_shift(x),
        mesh=ctx.mesh, in_specs=P("model"), out_specs=P("model"),
    )
    x = np.arange(8, dtype=np.int32)
    out = np.asarray(f(x))
    np.testing.assert_array_equal(out, np.roll(x, 1))
