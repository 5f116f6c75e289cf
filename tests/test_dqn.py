"""DQN training stack: replay semantics, one fused iteration, learning smoke,
checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gobblet_rl_tpu.models.mlp import QNet
from gobblet_rl_tpu.train import dqn, replay


def small_config(**kw):
    defaults = dict(
        buffer_size=4096,
        epoch=1,
        step_per_epoch=4,
        segment_len=8,
        update_per_collect=2,
        batch_size=128,
        num_envs=64,
        opponent="random",
    )
    defaults.update(kw)
    return dqn.DQNConfig(**defaults)


def test_dueling_head_identity():
    """Dueling head: Q = V + A - mean(A), so Q - mean(Q) == A - mean(A) and
    the head actually changes the parameter structure."""
    net = QNet(hidden_sizes=(32,), dueling=True)
    obs = jnp.zeros((4, 117), jnp.int8)
    params = net.init(jax.random.PRNGKey(0), obs)
    # value/advantage streams exist: 1 torso + 2 head Dense layers
    assert len(params["params"]) == 3
    q = net.apply(params, obs)
    assert q.shape == (4, 54)
    plain = QNet(hidden_sizes=(32,), dueling=False)
    assert len(plain.init(jax.random.PRNGKey(0), obs)["params"]) == 2


def test_double_dqn_target_differs_from_vanilla():
    """With double=True the online argmax picks the bootstrap action; on a
    random net this must differ from the vanilla max target for some batch
    rows (the two nets disagree), while both stay finite."""
    cfg_d = small_config(double=True, dueling=False)
    cfg_v = small_config(double=False, dueling=False)
    net = QNet(hidden_sizes=(32,))
    optimizer = optax.adam(1e-3)
    key = jax.random.PRNGKey(3)
    losses = {}
    for name, cfg in (("double", cfg_d), ("vanilla", cfg_v)):
        ts = dqn.init_train_state(cfg, net, optimizer, key)
        # make target and online params differ so the argmax choice matters
        ts = ts._replace(
            target_params=jax.tree.map(lambda x: x + 0.05, ts.params)
        )
        it, opp = dqn.make_train_iteration(cfg, net, optimizer)
        from gobblet_rl_tpu.train import replay as rp

        env_state = dqn.init_env_state(cfg, opp, ts.opponent_params, key)
        buffer = rp.make_buffer(cfg.buffer_size)
        ts, env_state, buffer, _, loss = it(ts, env_state, buffer, key)
        losses[name] = float(loss)
        assert np.isfinite(losses[name])
    assert losses["double"] != losses["vanilla"]


def test_nstep_fold_terminal_rewards():
    """Hand-built segment: terminal-only rewards fold per tianshou
    compute_nstep_return semantics (gamma=0.9, n=3)."""
    L, B = 6, 1
    obs = jnp.zeros((L, B, 117), jnp.int8)
    obs_n = jnp.arange(L, dtype=jnp.int8)[:, None, None] * jnp.ones((L, B, 117), jnp.int8)
    mask = jnp.ones((L, B, 54), bool)
    action = jnp.zeros((L, B), jnp.int32)
    # episode ends at t=2 with reward +1 (learner win); next episode ends t=5 reward -1
    reward = jnp.asarray([0, 0, 1, 0, 0, -1], jnp.float32)[:, None]
    done = jnp.asarray([0, 0, 1, 0, 0, 1], bool)[:, None]
    seg = replay.Segment(obs, action, reward, done, obs_n, mask)
    out = replay.nstep_fold(seg, 3, 0.9)
    r = np.asarray(out.reward[:, 0])
    d = np.asarray(out.done[:, 0])
    # t=0: r0 + g r1 + g^2 r2 = 0.81 ; done (ends within window)
    np.testing.assert_allclose(r, [0.81, 0.9, 1.0, -0.81, -0.9, -1.0], atol=1e-6)
    assert d.tolist() == [True] * 6
    # bootstrap obs frozen at the step where the episode ended
    o = np.asarray(out.obs_next[:, 0, 0])
    assert o.tolist() == [2, 2, 2, 5, 5, 5]


def test_buffer_ring_and_sample():
    buf = replay.make_buffer(256)
    L, B = 4, 32
    seg = replay.Segment(
        obs=jnp.ones((L, B, 117), jnp.int8),
        action=jnp.arange(L * B, dtype=jnp.int32).reshape(L, B),
        reward=jnp.ones((L, B), jnp.float32),
        done=jnp.zeros((L, B), bool),
        obs_next=jnp.ones((L, B, 117), jnp.int8),
        mask_next=jnp.ones((L, B, 54), bool),
    )
    buf = replay.insert_segment(buf, seg)
    assert int(buf.filled) == 128 and int(buf.cursor) == 128
    buf = replay.insert_segment(buf, seg)
    buf = replay.insert_segment(buf, seg)  # wraps
    assert int(buf.filled) == 256 and int(buf.cursor) == 128
    obs, action, r, d, obs_n, mask_n = replay.sample(buf, jax.random.PRNGKey(0), 64)
    assert obs.shape == (64, 117) and action.shape == (64,)


def test_train_iteration_runs_and_shapes():
    config = small_config()
    net = QNet(hidden_sizes=config.hidden_sizes)
    opt = optax.adam(config.lr)
    key = jax.random.PRNGKey(0)
    ts = dqn.init_train_state(config, net, opt, key)
    it, opp_fn = dqn.make_train_iteration(config, net, opt)
    env_state = dqn.init_env_state(config, opp_fn, ts.opponent_params, key)
    buf = replay.make_buffer(config.buffer_size)
    ts, env_state, buf, key, loss = it(ts, env_state, buf, key)
    assert np.isfinite(float(loss))
    assert int(buf.filled) == config.segment_len * config.num_envs
    assert int(ts.grad_steps) == config.update_per_collect
    # env invariant: every live env sits at the learner's turn
    assert (np.asarray(env_state.current) == config.learner_player).all()


def test_learner_player_1_invariant():
    config = small_config(learner_player=1)
    net = QNet(hidden_sizes=config.hidden_sizes)
    opt = optax.adam(config.lr)
    key = jax.random.PRNGKey(0)
    ts = dqn.init_train_state(config, net, opt, key)
    it, opp_fn = dqn.make_train_iteration(config, net, opt)
    env_state = dqn.init_env_state(config, opp_fn, ts.opponent_params, key)
    assert (np.asarray(env_state.current) == 1).all()
    buf = replay.make_buffer(config.buffer_size)
    for _ in range(3):
        key, sub = jax.random.split(key)
        ts, env_state, buf, key2, loss = it(ts, env_state, buf, sub)
    assert (np.asarray(env_state.current) == 1).all()


def test_learner_player_both_invariant():
    """Seat-agnostic training: alternating envs stay at THEIR learner seat
    after init and after every iteration, and eval runs per-env seats."""
    config = small_config(learner_player="both")
    net = QNet(hidden_sizes=config.hidden_sizes)
    opt = optax.adam(config.lr)
    key = jax.random.PRNGKey(0)
    ts = dqn.init_train_state(config, net, opt, key)
    it, opp_fn = dqn.make_train_iteration(config, net, opt)
    env_state = dqn.init_env_state(config, opp_fn, ts.opponent_params, key)
    seats = np.arange(config.num_envs) % 2
    assert (np.asarray(env_state.current) == seats).all()
    buf = replay.make_buffer(config.buffer_size)
    for _ in range(3):
        key, sub = jax.random.split(key)
        ts, env_state, buf, key2, loss = it(ts, env_state, buf, sub)
    assert np.isfinite(float(loss))
    assert (np.asarray(env_state.current) == seats).all()
    evaluate = dqn.make_eval_fn(config, net, opp_fn)
    w, l, other = evaluate(ts.params, ts.opponent_params, key,
                           num_steps=16, num_envs=64)
    assert int(w) + int(l) + int(other) > 0


@pytest.mark.slow
def test_dqn_learns_vs_random():
    """Short training run must clearly beat random (win-rate > 0.75)."""
    config = small_config(
        epoch=6, step_per_epoch=32, num_envs=256, batch_size=512,
        update_per_collect=4, buffer_size=1 << 16,
    )
    ts, history = dqn.train(config)
    assert history[-1]["win_rate"] > 0.75, history[-1]


def test_checkpoint_roundtrip(tmp_path):
    from gobblet_rl_tpu.train import checkpoint as ckpt

    config = small_config()
    net = QNet(hidden_sizes=config.hidden_sizes)
    opt = optax.adam(config.lr)
    ts = dqn.init_train_state(config, net, opt, jax.random.PRNGKey(0))
    ckpt.save(str(tmp_path / "ck"), ts, step=7)
    restored, step = ckpt.restore(str(tmp_path / "ck"), ts)
    assert step == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params,
        ts.params,
    )


def test_mixed_opponent_training_runs():
    """opponent='mixed' rotates per-iteration among random/greedy/self."""
    config = small_config(opponent="mixed", step_per_epoch=6)
    ts, history = dqn.train(config, generations=2)
    assert len(history) == 2
    assert all(np.isfinite(h["loss"]) for h in history)
