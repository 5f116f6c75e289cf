"""shard_map data-parallel PPO iteration.

Completes the parallel story for the third training family (DQN:
sharded_train.py, AlphaZero: sharded_alphazero.py): each device owns a
slice of the environment batch, runs the fused rollout + GAE + minibatch
updates locally, and gradients (plus the advantage-normalization moments)
sync with ``pmean`` over the ``env`` axis — the TPU-native replacement for
the reference's Ray PPO workers
(/root/reference/gobblet_rl/examples/example_RLlib.py:35-52, shipped broken
upstream; train/ppo.py is the working single-chip pipeline).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from gobblet_rl_tpu.models import actor_critic as ac
from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.parallel.mesh import ENV_AXIS
from gobblet_rl_tpu.train import ppo as ppo_mod

try:  # jax >= 0.6 top-level export
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_sharded_ppo_iteration(config: ppo_mod.PPOConfig, net, optimizer, mesh):
    """Returns a jitted ``(params, opp_params, opt_state, env_state, key, lp)
    -> (params, opt_state, env_state, stats)`` placed on ``mesh``.

    ``config.num_envs`` is the GLOBAL env count and must divide by the
    mesh's env-axis size.
    """
    n_env = mesh.shape[ENV_AXIS]
    assert config.num_envs % n_env == 0, (config.num_envs, n_env)
    local = dataclasses.replace(config, num_envs=config.num_envs // n_env)
    rollout = ppo_mod.make_learner_rollout(local, net)

    def loss_fn(params, batch, adv_mean, adv_std):
        logits, value = net.apply(params, batch["obs"])
        logp, entropy = ac.logp_entropy(logits, batch["mask"], batch["action"])
        ratio = jnp.exp(logp - batch["logp"])
        # advantage moments are synced across devices (pmean'd by the caller)
        adv = (batch["adv"] - adv_mean) / (adv_std + 1e-8)
        unclipped = ratio * adv
        clipped = jnp.clip(ratio, 1 - local.clip_eps, 1 + local.clip_eps) * adv
        pg_loss = -jnp.minimum(unclipped, clipped).mean()
        v_loss = jnp.mean((value - batch["ret"]) ** 2)
        total = pg_loss + local.vf_coef * v_loss - local.ent_coef * entropy.mean()
        return total

    def device_body(params, opp_params, opt_state, env_state, key, lp):
        key = jax.random.fold_in(key, jax.lax.axis_index(ENV_AXIS))
        key, k_roll = jax.random.split(key)
        env_state, traj, last_value, key = rollout(
            params, opp_params, env_state, k_roll, lp
        )
        adv, ret = ppo_mod.compute_gae(
            traj, last_value, local.gamma, local.gae_lambda
        )
        L, B = adv.shape
        n = L * B
        flat = {
            "obs": traj["obs"].reshape(n, -1),
            "mask": traj["mask"].reshape(n, -1),
            "action": traj["action"].reshape(n),
            "logp": traj["logp"].reshape(n),
            "adv": adv.reshape(n),
            "ret": ret.reshape(n),
        }
        # global advantage moments: one pmean pair per iteration
        adv_mean = jax.lax.pmean(flat["adv"].mean(), ENV_AXIS)
        adv_std = jnp.sqrt(
            jax.lax.pmean(((flat["adv"] - adv_mean) ** 2).mean(), ENV_AXIS)
        )
        mb = n // local.minibatches

        def epoch_body(carry, _):
            params, opt_state, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n)

            def mb_body(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                batch = {k: v[idx] for k, v in flat.items()}
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, batch, adv_mean, adv_std
                )
                grads = jax.lax.pmean(grads, ENV_AXIS)
                loss = jax.lax.pmean(loss, ENV_AXIS)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                mb_body, (params, opt_state), jnp.arange(local.minibatches)
            )
            return (params, opt_state, key), losses.mean()

        (params, opt_state, key), losses = jax.lax.scan(
            epoch_body, (params, opt_state, key), None,
            length=local.epochs_per_iter,
        )
        episodes = jax.lax.psum(traj["done"].sum(), ENV_AXIS)
        reward_sum = jax.lax.psum(
            (traj["reward"] * traj["done"]).sum(), ENV_AXIS
        )
        stats = {
            "loss": losses.mean(),
            "episodes": episodes,
            "mean_reward": reward_sum / jnp.maximum(episodes, 1),
        }
        return params, opt_state, env_state, stats

    dummy_state = bc.reset_planes(1)
    state_specs = jax.tree.map(
        lambda x: P(*([None] * (x.ndim - 1) + [ENV_AXIS])), dummy_state
    )

    @partial(jax.jit, static_argnums=(5,))
    def ppo_iteration(params, opp_params, opt_state, env_state, key, lp):
        p_specs = jax.tree.map(lambda _: P(), params)
        o_specs = jax.tree.map(lambda _: P(), opt_state)
        fn = shard_map(
            partial(device_body, lp=lp),
            mesh=mesh,
            in_specs=(p_specs, p_specs, o_specs, state_specs, P()),
            out_specs=(p_specs, o_specs, state_specs,
                       {"loss": P(), "episodes": P(), "mean_reward": P()}),
            check_vma=False,
        )
        return fn(params, opp_params, opt_state, env_state, key)

    return ppo_iteration
