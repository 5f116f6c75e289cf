"""Device-mesh utilities for multi-chip / multi-host scaling.

The reference's only "distributed" execution is Ray actors pickling sample
batches (/root/reference/gobblet_rl/examples/example_RLlib.py:44, SURVEY §2).
Here scaling is native SPMD: a ``jax.sharding.Mesh`` with an ``env`` axis
(data-parallel rollouts: each chip owns a slice of the environment batch and
its replay shard) and a ``model`` axis for tensor parallelism (Megatron-style
sharded Dense/Conv kernels, see parallel/tensor_parallel.py); gradients sync
with ``psum`` over ICI via ``shard_map`` (see parallel/sharded_train.py).

Multi-host entry: call :func:`init_distributed` once per process before any
jax op (wraps ``jax.distributed.initialize``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"
MODEL_AXIS = "model"


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bootstrap (no-op on a single host without args)."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(num_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """(env x model) mesh over the available devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (ENV_AXIS, MODEL_AXIS))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Lane-major env arrays shard their trailing batch axis over ENV_AXIS."""
    return NamedSharding(mesh, P(*(None,) * 0, ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(state, mesh: Mesh):
    """Place a lane-major PlanesState so the batch (last) axis is split over
    the env axis of the mesh."""

    def place(x):
        spec = P(*([None] * (x.ndim - 1) + [ENV_AXIS]))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, state)
