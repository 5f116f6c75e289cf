"""Multi-device sharding on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gobblet_rl_tpu.models.mlp import QNet
from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.parallel import mesh as mesh_mod
from gobblet_rl_tpu.parallel import sharded_train
from gobblet_rl_tpu.train import dqn, replay


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.make_mesh(8)


def test_sharded_train_iteration(mesh8):
    config = dqn.DQNConfig(
        num_envs=64, buffer_size=2048, batch_size=64,
        segment_len=4, update_per_collect=2, opponent="random",
    )
    net = QNet(hidden_sizes=config.hidden_sizes)
    optimizer = optax.adam(config.lr)
    key = jax.random.PRNGKey(0)
    ts = dqn.init_train_state(config, net, optimizer, key)
    env_state = mesh_mod.shard_env_state(bc.reset_planes(config.num_envs), mesh8)
    buffer = replay.make_buffer(config.buffer_size)

    it, _ = sharded_train.make_sharded_train_iteration(config, net, optimizer, mesh8)
    ts, env_state, buffer, loss = it(ts, env_state, buffer, key)
    assert np.isfinite(float(loss))
    assert int(ts.grad_steps) == config.update_per_collect
    # env batch stays sharded over the env axis
    shard_axes = env_state.board.sharding.spec
    assert shard_axes[-1] == mesh_mod.ENV_AXIS
    # a second iteration continues from donated buffer
    ts, env_state, buffer, loss2 = it(ts, env_state, buffer, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss2))
    # cursor/filled are per-device shard counters (identical on every device)
    assert int(buffer.filled) == 2 * config.segment_len * (config.num_envs // 8)


def test_sharded_alphazero_iteration(mesh8):
    from gobblet_rl_tpu.parallel import sharded_alphazero
    from gobblet_rl_tpu.train import alphazero as az

    config = az.AZConfig(
        num_envs=16, num_sims=6, segment_len=6, temp_moves=2,
        batch_size=32, updates_per_iter=2, model="mlp", hidden_sizes=(16,),
    )
    net, optimizer, st = az.init_alphazero(config, jax.random.PRNGKey(0))
    env_state = mesh_mod.shard_env_state(st.env_state, mesh8)
    it = sharded_alphazero.make_sharded_az_iteration(config, net, optimizer, mesh8)
    params, opt_state, env_state, stats = it(
        st.params, st.opt_state, env_state, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(stats["loss"]))
    assert env_state.board.sharding.spec[-1] == mesh_mod.ENV_AXIS
    changed = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool((a != b).any()), st.params, params),
    )
    assert changed
    # params come back replicated (pmean'd grads -> identical update)
    assert params["params"]["Dense_0"]["kernel"].sharding.is_fully_replicated
    # second iteration reuses the compiled program
    _, _, _, stats2 = it(params, opt_state, env_state, jax.random.PRNGKey(2))
    assert np.isfinite(float(stats2["loss"]))


def test_sharded_rollout_scales(mesh8):
    """The pure rollout shards trivially: jit with sharded inputs."""
    B = 1024
    state = mesh_mod.shard_env_state(bc.reset_planes(B), mesh8)
    state, _, stats = bc.rollout_random(state, jax.random.PRNGKey(0), 32)
    assert int(stats["episodes"]) > 0


def test_graft_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 54)
    ge.dryrun_multichip(8)
