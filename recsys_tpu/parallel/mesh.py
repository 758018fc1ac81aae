"""Device-mesh construction and multi-host runtime setup.

The reference's entire distribution story is a single-host
``tf.distribute.MirroredStrategy`` selected at ``src/trainer.py:45-48``;
its ``multi_worker`` CLI choice is dead code (``scripts/train.py:128-133``).
Here the runtime core is a named 2-D mesh ``('data', 'model')``:

* ``data``  — batch (data-parallel) axis; gradient psum rides ICI.
* ``model`` — embedding-row / item-catalog shard axis; lookup exchange
  and top-k merge collectives live on it.

Multi-host setup is ``jax.distributed.initialize()`` + the same code —
XLA places collectives over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed() -> None:
    """Initialize the multi-host JAX runtime when launched under a
    multi-process coordinator (no-op single-process)."""
    if jax.process_count() > 1:
        return  # already initialized
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord and os.environ.get("JAX_NUM_PROCESSES"):
        # an environment hook (e.g. a container sitecustomize) may have
        # initialized a backend at import time, which
        # jax.distributed.initialize refuses to follow — drop the cached
        # backends first so the distributed runtime owns initialization
        import jax.extend.backend as _jeb

        try:
            _jeb.clear_backends()
        except Exception:  # pragma: no cover — nothing was initialized
            pass
        if os.environ.get("JAX_PLATFORMS"):
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """A mesh plus the axis names and per-host batch bookkeeping."""

    mesh: Mesh
    data_axis: str = DATA_AXIS
    model_axis: str = MODEL_AXIS

    @property
    def n_data(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def n_model(self) -> int:
        return self.mesh.shape[self.model_axis]

    @property
    def n_devices(self) -> int:
        return self.n_data * self.n_model

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    def local_batch(self, global_batch: int) -> int:
        if global_batch % self.n_data:
            raise ValueError(
                f"global batch {global_batch} not divisible by data axis {self.n_data}"
            )
        return global_batch // self.n_data


def force_virtual_cpu_devices(n_devices: int) -> None:
    """Ensure at least ``n_devices`` JAX devices exist by switching to a
    virtual CPU pool when needed. Safe to call after another backend
    (e.g. a single-chip TPU) has initialized: cached backends are
    dropped FIRST, then the CPU platform is selected with an explicit
    device count (``jax_num_cpu_devices`` bypasses the one-shot
    process-wide XLA_FLAGS parse)."""
    try:
        have = len(jax.devices())
    except RuntimeError:
        have = 0
    if have < n_devices:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_devices)


def make_mesh(
    model_parallel: int = 1,
    data_parallel: int = -1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> MeshContext:
    """Build a ``(data, model)`` mesh over all (or given) devices.

    ``data_parallel=-1`` means "every device not used by model
    parallelism". Device order follows ``jax.devices()`` so that the
    ``model`` axis lands on adjacent devices (ICI neighbours on real
    TPU topologies, which keeps the all-to-all/all-gather traffic local).
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if model_parallel < 1:
        raise ValueError("model_parallel must be >= 1")
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    if data_parallel == -1:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"data_parallel({data_parallel}) * model_parallel({model_parallel}) != {n}"
        )
    arr = np.array(devs).reshape(data_parallel, model_parallel)
    mesh = Mesh(arr, axis_names=axis_names)
    logger.info(
        "mesh: %d devices -> data=%d model=%d (%s)",
        n, data_parallel, model_parallel, devs[0].platform,
    )
    return MeshContext(mesh=mesh, data_axis=axis_names[0], model_axis=axis_names[1])


def cpu_mesh(n_devices: int = 8, model_parallel: int = 1) -> MeshContext:
    """Testing helper: a mesh over forced-host CPU devices (requires
    ``XLA_FLAGS=--xla_force_host_platform_device_count=N`` before the
    first JAX call — see ``tests/conftest.py``)."""
    devs = jax.devices()[:n_devices]
    return make_mesh(model_parallel=model_parallel, devices=devs)
