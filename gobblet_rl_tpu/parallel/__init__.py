"""Multi-device / multi-host scaling: mesh utilities, shard_map training
iterations for all three training families, GSPMD tensor parallelism, and
the multi-process (DCN) runner."""

from gobblet_rl_tpu.parallel.mesh import (
    ENV_AXIS,
    MODEL_AXIS,
    env_sharding,
    init_distributed,
    make_mesh,
    replicated,
    shard_env_state,
)

__all__ = [
    "ENV_AXIS",
    "MODEL_AXIS",
    "env_sharding",
    "init_distributed",
    "make_mesh",
    "replicated",
    "shard_env_state",
]
