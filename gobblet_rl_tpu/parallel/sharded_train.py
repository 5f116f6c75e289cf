"""shard_map data-parallel DQN training step.

Scales the fused actor-learner iteration (train/dqn.py) over a device mesh:
each device owns a slice of the environment batch and of the replay buffer,
runs collect + n-step fold + local minibatch gradients, and gradients are
averaged with ``psum`` over the ``env`` axis (ICI collectives) before the
replicated Adam update — the TPU-native replacement for the reference's Ray
rollout workers (SURVEY §2 / §5 distributed-backend mapping).

Layout:
* TrainState (params/target/opt_state): replicated, identical update on
  every device (grads are pmean'd);
* PlanesState: batch-last arrays sharded on their trailing ``env`` axis;
* ReplayBuffer: row-sharded (each device keeps its own ring);
* PRNG: one replicated key, per-device streams via fold_in(axis_index).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gobblet_rl_tpu.models.mlp import QNet, masked_q
from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.parallel.mesh import ENV_AXIS
from gobblet_rl_tpu.train import dqn as dqn_mod
from gobblet_rl_tpu.train import replay

try:  # jax >= 0.6 top-level export
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _planes_specs(state: bc.PlanesState) -> bc.PlanesState:
    return jax.tree.map(
        lambda x: P(*([None] * (x.ndim - 1) + [ENV_AXIS])), state
    )


def _buffer_specs(buffer: replay.ReplayBuffer) -> replay.ReplayBuffer:
    """Rows sharded over the env axis; cursor/filled are per-device counters
    that stay identical across devices (every device inserts the same count),
    so they are declared replicated."""
    specs = jax.tree.map(lambda x: P(ENV_AXIS, *([None] * (x.ndim - 1))), buffer)
    return specs._replace(cursor=P(), filled=P())


def make_sharded_train_iteration(config: dqn_mod.DQNConfig, net: QNet, optimizer, mesh):
    """Returns (train_iteration, opponent_fn); call with globally-shaped
    (ts, env_state, buffer, key) placed on ``mesh``.

    ``config.num_envs``, ``buffer_size`` and ``batch_size`` are GLOBAL sizes
    and must divide by the mesh's env-axis size.
    """
    n_env = mesh.shape[ENV_AXIS]
    assert config.num_envs % n_env == 0
    assert config.buffer_size % n_env == 0
    assert config.batch_size % n_env == 0

    import dataclasses

    local = dataclasses.replace(
        config,
        num_envs=config.num_envs // n_env,
        buffer_size=config.buffer_size // n_env,
        batch_size=config.batch_size // n_env,
    )
    opponent_fn = dqn_mod.make_opponent_fn(local, net)
    learner_step = dqn_mod.make_learner_step(local, opponent_fn)
    L = local.segment_len + local.n_step - 1

    def collect(ts, env_state, key):
        """State-snapshot collect (see train/dqn.py + train/replay.py): the
        ring stores raw boards; features derive at sample time."""

        def body(carry, _):
            env_state, key = carry
            key, k_eps, k_step = jax.random.split(key, 3)
            obs = dqn_mod._obs_bf(env_state.board, env_state.current)
            mask = bc.legal_mask_planes(env_state.board, env_state.current).T
            q = net.apply(ts.params, obs)
            actions = dqn_mod._eps_greedy(k_eps, q, mask, local.eps_train)
            new_state, r, done = learner_step(
                env_state, actions, k_step, ts.opponent_params
            )
            return (new_state, key), (
                env_state.board, env_state.current, actions, r, done
            )

        (env_state, key), (boards, currents, actions, r, done) = jax.lax.scan(
            body, (env_state, key), None, length=L
        )
        sseg = replay.StateSegment(
            board=jnp.concatenate([boards, env_state.board[None]]),
            current=jnp.concatenate([currents, env_state.current[None]]),
            action=actions,
            reward=r,
            done=done,
        )
        return env_state, sseg, key

    def update(ts, batch):
        import optax

        obs, action, reward_n, done_n, obs_n, mask_n = batch
        q_next = masked_q(net.apply(ts.target_params, obs_n), mask_n)
        if local.double:
            a_star = jnp.argmax(
                masked_q(net.apply(ts.params, obs_n), mask_n), axis=-1
            )
            q_star = jnp.take_along_axis(q_next, a_star[:, None], axis=-1)[:, 0]
        else:
            q_star = jnp.max(q_next, axis=-1)
        target = reward_n + (local.gamma ** local.n_step) * (~done_n) * q_star
        target = jax.lax.stop_gradient(target)

        def loss_fn(params):
            q = net.apply(params, obs)
            q_a = jnp.take_along_axis(q, action[:, None], axis=-1)[:, 0]
            return jnp.mean((q_a - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(ts.params)
        # cross-device gradient sync: the only collective in the loop
        grads = jax.lax.pmean(grads, ENV_AXIS)
        loss = jax.lax.pmean(loss, ENV_AXIS)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        grad_steps = ts.grad_steps + 1
        sync = grad_steps % local.target_update_freq == 0
        target_params = jax.tree.map(
            lambda t, p: jnp.where(sync, p, t), ts.target_params, params
        )
        return (
            ts._replace(
                params=params,
                target_params=target_params,
                opt_state=opt_state,
                grad_steps=grad_steps,
            ),
            loss,
        )

    def device_body(ts, env_state, buffer, key):
        # per-device RNG stream
        key = jax.random.fold_in(key, jax.lax.axis_index(ENV_AXIS))
        key, k_collect = jax.random.split(key)
        env_state, sseg, key = collect(ts, env_state, k_collect)
        buffer = replay.insert_segment(
            buffer, sseg, local.n_step, local.gamma, local.segment_len
        )

        # one gather for all minibatches (see train/dqn.py)
        key, k_sample = jax.random.split(key)
        U = local.update_per_collect
        flat_batch = replay.sample(buffer, k_sample, local.batch_size * U)
        minibatches = jax.tree.map(
            lambda x: x.reshape((U, local.batch_size) + x.shape[1:]),
            flat_batch,
        )

        def upd(ts, batch):
            ts, loss = update(ts, batch)
            return ts, loss

        ts, losses = jax.lax.scan(upd, ts, minibatches)
        return ts, env_state, buffer, losses.mean()

    dummy_state = bc.reset_planes(1)
    dummy_buffer = replay.make_buffer(1)
    state_specs = _planes_specs(dummy_state)
    buffer_specs = _buffer_specs(dummy_buffer)

    def train_iteration(ts, env_state, buffer, key):
        ts_specs = jax.tree.map(lambda _: P(), ts)
        fn = shard_map(
            device_body,
            mesh=mesh,
            in_specs=(ts_specs, state_specs, buffer_specs, P()),
            out_specs=(ts_specs, state_specs, buffer_specs, P()),
            check_vma=False,
        )
        return fn(ts, env_state, buffer, key)

    return jax.jit(train_iteration, donate_argnums=(2,)), opponent_fn
