"""Sharded-lookup equivalence tests on the CPU mesh: psum and
all-to-all paths must match the replicated gather, forward AND backward
(SURVEY §7.3 'CPU-mesh correctness tests vs the replicated path')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.embed.table import (
    lookup_replicated,
    make_sharded_lookup_a2a,
    make_sharded_lookup_psum,
)
from recsys_tpu.parallel.mesh import make_mesh
from recsys_tpu.parallel.sharding import rows_sharding, batch_sharding


@pytest.fixture(scope="module")
def setup():
    ctx = make_mesh(model_parallel=4)  # data=2 x model=4
    rng = np.random.default_rng(0)
    V, D, B = 64, 8, 16
    table = rng.normal(size=(V, D)).astype(np.float32)
    ids = rng.integers(0, V, B).astype(np.int32)
    table_dev = jax.device_put(table, rows_sharding(ctx))
    ids_dev = jax.device_put(ids, batch_sharding(ctx))
    return ctx, table, ids, table_dev, ids_dev


def test_psum_lookup_matches_replicated(setup):
    ctx, table, ids, table_dev, ids_dev = setup
    f = make_sharded_lookup_psum(ctx)
    out = np.asarray(f(table_dev, ids_dev))
    np.testing.assert_allclose(out, table[ids], rtol=1e-6)


def test_psum_lookup_backward(setup):
    ctx, table, ids, table_dev, ids_dev = setup
    f = make_sharded_lookup_psum(ctx)

    def loss_sharded(t):
        return jnp.sum(f(t, ids_dev) ** 2)

    def loss_ref(t):
        return jnp.sum(lookup_replicated(t, jnp.asarray(ids)) ** 2)

    g_sh = np.asarray(jax.grad(loss_sharded)(table_dev))
    g_ref = np.asarray(jax.grad(loss_ref)(jnp.asarray(table)))
    np.testing.assert_allclose(g_sh, g_ref, rtol=1e-5)


def test_a2a_lookup_matches_replicated(setup):
    ctx, table, ids, table_dev, ids_dev = setup
    # B=16 over data=2 -> 8 local ids; capacity 8 per bucket is ample
    f = make_sharded_lookup_a2a(ctx, capacity=8)
    out, overflow = f(table_dev, ids_dev)
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)


def test_a2a_lookup_with_duplicates(setup):
    ctx, table, _, table_dev, _ = setup
    ids = np.array([3, 3, 3, 3, 17, 17, 50, 50] * 2, np.int32)
    ids_dev = jax.device_put(ids, batch_sharding(ctx))
    f = make_sharded_lookup_a2a(ctx, capacity=8)
    out, overflow = f(table_dev, ids_dev)
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)


def test_a2a_overflow_reported(setup):
    ctx, table, _, table_dev, _ = setup
    # all 8 local ids hit shard 0 with capacity 4 -> overflow
    ids = np.arange(16, dtype=np.int32) % 8  # all in shard 0 (rows 0..15)
    ids_dev = jax.device_put(ids, batch_sharding(ctx))
    f = make_sharded_lookup_a2a(ctx, capacity=4)
    out, overflow = f(table_dev, ids_dev)
    assert int(overflow) > 0


def test_a2a_overflow_never_clobbers_fitting_requests(setup):
    """Round-5 determinism fix: the sort-based bucketing scattered
    overflowing ids onto bucket slot 0 with a duplicate write that
    raced the legitimate occupant (nondeterministically zeroing a
    FITTING element's row). The counting-rank version drops overflow
    out of bounds: the first `capacity` ids of each bucket (in
    original order) must be served exactly; the rest get zero rows and
    are counted."""
    ctx, table, _, table_dev, _ = setup
    ids = np.arange(16, dtype=np.int32) % 8  # all owned by shard 0
    ids_dev = jax.device_put(ids, batch_sharding(ctx))
    f = make_sharded_lookup_a2a(ctx, capacity=4)
    out, overflow = f(table_dev, ids_dev)
    out = np.asarray(out)
    assert int(overflow) == 8  # 4 of 8 local ids overflow, x2 replicas
    for lo in (0, 8):  # each data replica's local batch
        np.testing.assert_allclose(out[lo : lo + 4],
                                   table[ids[lo : lo + 4]], rtol=1e-6)
        np.testing.assert_array_equal(out[lo + 4 : lo + 8],
                                      np.zeros((4, table.shape[1])))


def test_a2a_backward(setup):
    ctx, table, ids, table_dev, ids_dev = setup
    f = make_sharded_lookup_a2a(ctx, capacity=8)

    def loss_sharded(t):
        out, _ = f(t, ids_dev)
        return jnp.sum(out ** 2)

    def loss_ref(t):
        return jnp.sum(lookup_replicated(t, jnp.asarray(ids)) ** 2)

    g_sh = np.asarray(jax.grad(loss_sharded)(table_dev))
    g_ref = np.asarray(jax.grad(loss_ref)(jnp.asarray(table)))
    np.testing.assert_allclose(g_sh, g_ref, rtol=1e-5)
