"""Determinism / desync debugging tools (SURVEY §5.2).

The reference has no race detection of any kind (single-process TF).
The TPU-native analogue of a race is **replica desynchronization**:
parameters that are nominally replicated over the ``data`` mesh axis
drifting apart across devices or hosts (a bad collective, a per-replica
RNG leak, a nondeterministic reduction). These helpers make that
observable:

* :func:`per_device_checksums` — one order-independent checksum of a
  (nominally replicated) pytree per data-axis slot, computed on device
  via ``shard_map``.
* :func:`assert_replicated` — raises when replicas disagree.
* :func:`enable_nan_checks` — turns on ``jax_debug_nans`` (every jitted
  computation re-runs un-jitted on NaN so the faulting op is named).

Wired into the trainer via ``TrainConfig.replication_check_every_epochs``
and ``TrainConfig.debug_nans``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def _tree_checksum(tree: Any) -> jnp.ndarray:
    """Order-independent fp32 checksum of every leaf: sum of |x| plus
    sum of x (catches sign flips that |x| alone would miss). Reported
    for observability; the desync DETECTOR is :func:`_tree_bit_checksum`
    (an fp32 magnitude sum over ~1e7 |params| has ~10 absolute
    tolerance — single-element drift vanishes in the reduction)."""
    total = jnp.float32(0.0)
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "dtype"):
            continue
        if jnp.issubdtype(leaf.dtype, jnp.floating) or jnp.issubdtype(
            leaf.dtype, jnp.integer
        ):
            x = leaf.astype(jnp.float32)
            total = total + jnp.sum(jnp.abs(x)) + jnp.sum(x)
    return total


def _tree_bit_checksum(tree: Any) -> jnp.ndarray:
    """Bit-exact order-independent checksum: XOR-fold of every leaf's
    raw bit pattern. Replicated state is produced by the SAME compiled
    computation on every data-axis slot (XLA collectives return
    identical values on all participants), so true replicas are bitwise
    identical — a single flipped bit anywhere changes this checksum,
    with no float-absorption blind spot."""
    from jax import lax

    total = jnp.uint32(0)
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "dtype"):
            continue
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            bits = lax.bitcast_convert_type(
                leaf.astype(jnp.float32), jnp.uint32
            )
        elif jnp.issubdtype(leaf.dtype, jnp.integer):
            bits = leaf.astype(jnp.uint32)
        else:
            continue
        folded = lax.reduce(
            bits, jnp.uint32(0), lax.bitwise_xor, tuple(range(bits.ndim))
        )
        total = total ^ folded
    return total


def per_device_checksums(tree: Any, mesh: Mesh, data_axis: str = "data"):
    """Checksum the pytree independently on every device.

    The input is treated as replicated (``P()``); each device computes
    the checksum of ITS copy, so the returned ``[n_devices]`` vector is
    constant iff the replicas agree. Model-axis sharded leaves (row-
    sharded tables) are excluded — they are *supposed* to differ per
    model slot; this checks the replication contract only."""

    # Only leaves that are fully replicated participate; rows-sharded
    # tables (PartitionSpec with a named axis) are deliberately skipped.
    def _replicated(leaf) -> bool:
        sh = getattr(leaf, "sharding", None)
        spec = getattr(sh, "spec", None)
        if spec is None:
            return True
        return all(s is None for s in spec)

    rep_leaves = [l for l in jax.tree.leaves(tree) if _replicated(l)]

    all_axes = tuple(mesh.axis_names)
    # one checksum per DEVICE (replicated leaves must agree everywhere,
    # the data/model distinction only matters for which leaves
    # participate); a tuple spec packs every mesh axis onto one dim
    ordered = (data_axis,) + tuple(n for n in all_axes if n != data_axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(),  # pytree prefix: every leaf replicated
        out_specs=(P(ordered), P(ordered)),
    )
    def _per_slot(leaves):
        return (
            _tree_checksum(leaves).reshape(1),
            _tree_bit_checksum(leaves).reshape(1),
        )

    mag, bits = _per_slot(rep_leaves)
    if jax.process_count() > 1:
        # the [n_devices] outputs span non-addressable devices on a
        # multi-process mesh; gather every device's checksum to every
        # host so the cross-PROCESS replication contract is what gets
        # asserted (audited by test_multihost.py's resume test)
        from jax.experimental import multihost_utils

        return (
            np.asarray(multihost_utils.process_allgather(mag, tiled=True)),
            np.asarray(multihost_utils.process_allgather(bits, tiled=True)),
        )
    return np.asarray(mag), np.asarray(bits)


def assert_replicated(tree: Any, mesh: Mesh, data_axis: str = "data",
                      rtol: float = 1e-6) -> np.ndarray:
    """Raise ``RuntimeError`` if nominally replicated state has drifted
    across the data axis. Detection is bit-exact (XOR checksum of raw
    bit patterns — replicas of the same compiled step are bitwise
    identical, so even one-element drift is caught); the fp32 magnitude
    checksum is returned for logging. ``rtol`` guards the magnitude
    comparison as a secondary sanity check only."""
    sums, bits = per_device_checksums(tree, mesh, data_axis)
    if np.any(bits != bits[0]):
        raise RuntimeError(
            f"replica desync detected: per-device bit checksums "
            f"{[hex(int(b)) for b in bits.ravel()]} differ — nominally "
            f"replicated state is not bitwise identical across the "
            f"'{data_axis}' mesh axis (magnitude checksums "
            f"{sums.tolist()})"
        )
    ref = sums[0]
    tol = rtol * max(abs(float(ref)), 1.0)
    if np.any(np.abs(sums - ref) > tol):
        raise RuntimeError(
            f"replica desync detected: per-device checksums {sums.tolist()} "
            f"(tolerance {tol:.3g}) — nominally replicated state differs "
            f"across the '{data_axis}' mesh axis"
        )
    return sums


def enable_nan_checks() -> None:
    """``jax_debug_nans``: any NaN produced under jit re-runs the op
    eagerly and raises with the faulting primitive named."""
    jax.config.update("jax_debug_nans", True)
