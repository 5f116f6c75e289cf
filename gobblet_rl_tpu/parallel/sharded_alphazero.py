"""shard_map data-parallel AlphaZero training step.

Scales the fused self-play + learn iteration (train/alphazero.py) over a
device mesh: each device owns a slice of the self-play game batch, runs the
batched MCTS locally (the search is embarrassingly parallel across games —
no cross-game state), computes gradients on its own segment, and gradients
are averaged with ``pmean`` over the ``env`` axis before the replicated
AdamW update.  Same layout discipline as parallel/sharded_train.py (the DQN
variant): params/opt_state replicated, lane-major env state sharded on its
trailing batch axis, one replicated PRNG key with per-device streams via
``fold_in(axis_index)``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.parallel.mesh import ENV_AXIS
from gobblet_rl_tpu.train import alphazero as az

try:  # jax >= 0.6 top-level export
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _planes_specs(state: bc.PlanesState) -> bc.PlanesState:
    return jax.tree.map(
        lambda x: P(*([None] * (x.ndim - 1) + [ENV_AXIS])), state
    )


def make_sharded_az_iteration(config: az.AZConfig, net, optimizer, mesh):
    """Returns a jitted ``(params, opt_state, env_state, key) ->
    (params, opt_state, env_state, stats)`` placed on ``mesh``.

    ``config.num_envs`` and ``batch_size`` are GLOBAL sizes and must divide
    by the mesh's env-axis size.
    """
    n_env = mesh.shape[ENV_AXIS]
    assert config.num_envs % n_env == 0, (config.num_envs, n_env)
    local = dataclasses.replace(
        config,
        num_envs=config.num_envs // n_env,
        batch_size=max(1, config.batch_size // n_env),
    )
    segment = az.make_selfplay_segment(local, net)
    loss_fn = az.make_loss_fn(local, net)

    def device_body(params, opt_state, env_state, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(ENV_AXIS))
        key, k_roll, k_perm = jax.random.split(key, 3)
        env_state, traj = segment(params, env_state, k_roll)
        bootstrap = (
            traj["v_signed"]
            if local.bootstrap_unfinished and "v_signed" in traj
            else None
        )
        z, valid = az.assign_outcomes(
            traj["done"], traj["winner"], traj["player"], bootstrap
        )
        flat = az.flatten_segment(traj, z, valid)
        n = flat["z"].shape[0]
        mb = max(1, min(local.batch_size, n // max(local.updates_per_iter, 1)))
        perm = jax.random.permutation(k_perm, n)

        def update(carry, i):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(perm, (i * mb) % max(n - mb, 1), mb)
            batch = {k: v[idx] for k, v in flat.items()}
            (loss, (p_l, v_l)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch)
            # cross-device gradient sync: the only collective in the loop
            grads = jax.lax.pmean(grads, ENV_AXIS)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, p_l, v_l)

        (params, opt_state), (losses, p_ls, v_ls) = jax.lax.scan(
            update, (params, opt_state), jnp.arange(local.updates_per_iter)
        )
        stats = {
            "loss": jax.lax.pmean(losses.mean(), ENV_AXIS),
            "policy_loss": jax.lax.pmean(p_ls.mean(), ENV_AXIS),
            "value_loss": jax.lax.pmean(v_ls.mean(), ENV_AXIS),
            "episodes": jax.lax.psum(traj["done"].sum(), ENV_AXIS),
            "valid_frac": jax.lax.pmean(valid.mean(), ENV_AXIS),
        }
        return params, opt_state, env_state, stats

    state_specs = _planes_specs(bc.reset_planes(1))

    def train_iteration(params, opt_state, env_state, key):
        rep = jax.tree.map(lambda _: P(), (params, opt_state))
        stats_specs = {k: P() for k in
                       ("loss", "policy_loss", "value_loss", "episodes",
                        "valid_frac")}
        fn = shard_map(
            device_body,
            mesh=mesh,
            in_specs=(rep[0], rep[1], state_specs, P()),
            out_specs=(rep[0], rep[1], state_specs, stats_specs),
            check_vma=False,
        )
        return fn(params, opt_state, env_state, key)

    return jax.jit(train_iteration)
