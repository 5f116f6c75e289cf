"""Tensor (model) parallelism over the mesh's MODEL_AXIS via GSPMD.

Gives the mesh's ``model`` axis a real job: Dense kernels are sharded
Megatron-style — alternating column-parallel (outputs split, ``P(None,
"model")``) and row-parallel (inputs split, ``P("model", None)``) so
activations stay feature-sharded between the pair and XLA inserts a single
``psum`` after each row-parallel matmul; Conv kernels shard their output
channels.  Because the annotations are plain ``NamedSharding`` placements on
the parameter pytree, the unchanged ``net.apply`` / ``value_and_grad`` /
``optax`` code runs tensor-parallel under ``jit`` — the compiler propagates
the shardings and plants the collectives (the "pick a mesh, annotate, let
XLA insert collectives" recipe).

The nets here are small enough that TP is about *capability*, not need: this
module is the pattern a bigger model family drops into, and the driver
dryrun + tests/test_sharding.py prove it compiles and matches the replicated
math.  The reference has no model parallelism of any kind (SURVEY §2:
no TP/PP/SP anywhere).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gobblet_rl_tpu.parallel.mesh import ENV_AXIS, MODEL_AXIS


def _path_names(path) -> list[str]:
    names = []
    for entry in path:
        if hasattr(entry, "key"):
            names.append(str(entry.key))
        elif hasattr(entry, "name"):
            names.append(str(entry.name))
        else:  # pragma: no cover - index entries
            names.append(str(entry))
    return names


def tp_specs(params, model_size: int) -> "jax.tree_util.PyTreeDef":
    """PartitionSpec pytree for a flax param tree.

    Dense kernels alternate column-/row-parallel in traversal order; a
    kernel whose shardable dim does not divide by ``model_size`` (e.g. the
    54-way head) stays replicated.  Biases follow their kernel: sharded
    after a column-parallel layer, replicated after a row-parallel one.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    col_next = True  # alternation state across Dense kernels
    bias_spec_by_layer: dict[str, P] = {}

    # first pass: kernels (flatten order is deterministic; biases of a layer
    # appear before its kernel alphabetically, so resolve them in pass 2)
    kernel_specs: dict[str, P] = {}
    for path, leaf in flat:
        names = _path_names(path)
        if names[-1] != "kernel" or leaf.ndim < 2:
            continue
        layer = "/".join(names[:-1])
        if leaf.ndim == 2:
            d_in, d_out = leaf.shape
            if col_next and d_out % model_size == 0:
                kernel_specs[layer] = P(None, MODEL_AXIS)
                bias_spec_by_layer[layer] = P(MODEL_AXIS)
                col_next = False
            elif not col_next and d_in % model_size == 0:
                kernel_specs[layer] = P(MODEL_AXIS, None)
                bias_spec_by_layer[layer] = P()
                col_next = True
            else:
                kernel_specs[layer] = P()
                bias_spec_by_layer[layer] = P()
        else:  # conv kernel HWIO: shard output channels
            if leaf.shape[-1] % model_size == 0:
                kernel_specs[layer] = P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
                bias_spec_by_layer[layer] = P(MODEL_AXIS)
            else:
                kernel_specs[layer] = P()
                bias_spec_by_layer[layer] = P()

    for path, leaf in flat:
        names = _path_names(path)
        layer = "/".join(names[:-1])
        if names[-1] == "kernel" and layer in kernel_specs:
            specs.append(kernel_specs[layer])
        elif names[-1] == "bias" and layer in bias_spec_by_layer:
            specs.append(bias_spec_by_layer[layer])
        else:
            specs.append(P())
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params_tp(params, mesh: Mesh):
    """Place a param tree tensor-parallel over mesh[MODEL_AXIS]."""
    specs = tp_specs(params, mesh.shape[MODEL_AXIS])
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_batch_dp(batch, mesh: Mesh):
    """Shard the leading batch axis over ENV_AXIS (batch-first arrays)."""
    spec = lambda x: P(*([ENV_AXIS] + [None] * (x.ndim - 1)))
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec(x))), batch
    )


def place_dp_tp(train_state, optimizer, mesh: Mesh):
    """Place a ``(params, opt_state, env_state)`` training state for a DP×TP
    run of the UNCHANGED jitted train iteration of a real family (used with
    train/alphazero.py's conv net; tests/test_sharding.py verifies the
    tensor-parallel update numerics against the replicated update on
    identical data).  Params (and a freshly initialized optimizer state,
    which inherits their placement) shard Megatron-style over MODEL_AXIS;
    the lane-major env batch shards over ENV_AXIS; GSPMD propagates both
    through the whole self-play + update program and inserts the
    collectives."""
    from gobblet_rl_tpu.parallel.mesh import shard_env_state

    tp_params = shard_params_tp(train_state.params, mesh)
    return train_state._replace(
        params=tp_params,
        opt_state=optimizer.init(tp_params),
        env_state=shard_env_state(train_state.env_state, mesh),
    )


def make_tp_train_step(net, optimizer, mesh: Mesh):
    """jit'd DP×TP supervised Q-regression step: batch sharded over ``env``,
    params sharded over ``model``; gradients/updates inherit the param
    shardings so the optimizer state is tensor-parallel too."""

    def step(params, opt_state, obs, mask, target):
        import optax

        def loss_fn(p):
            q = net.apply(p, obs)
            q = jnp.where(mask, q, 0.0)
            return jnp.mean((q - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)
