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


def make_rows(n, base=0):
    """Synthetic TransitionBatch rows with identifiable action values."""
    return replay.TransitionBatch(
        board=jnp.zeros((n, 27), jnp.int8),
        current=jnp.zeros(n, jnp.int8),
        action=base + jnp.arange(n, dtype=jnp.int32),
        reward_n=jnp.full(n, float(base), jnp.float32),
        done_n=jnp.zeros(n, bool),
        board_n=jnp.zeros((n, 27), jnp.int8),
        current_n=jnp.zeros(n, jnp.int8),
    )


def test_buffer_ring_and_sample():
    buf = replay.make_buffer(256)
    rows = make_rows(128)
    buf = replay.insert_rows(buf, rows)
    assert int(buf.filled) == 128 and int(buf.cursor) == 128
    buf = replay.insert_rows(buf, rows)
    buf = replay.insert_rows(buf, rows)  # wraps
    assert int(buf.filled) == 256 and int(buf.cursor) == 128
    obs, action, r, d, obs_n, mask_n = replay.sample(buf, jax.random.PRNGKey(0), 64)
    assert obs.shape == (64, 117) and action.shape == (64,)
    assert mask_n.shape == (64, 54) and mask_n.dtype == bool
    # empty board -> all 54 moves legal, all obs planes zero except nothing
    assert bool(mask_n.all())


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


def test_buffer_unaligned_wrap_matches_numpy_ring():
    """insert_segment's fast memcpy path (TPU: dynamic_update_slice) must
    fall back to exact ring semantics when the cursor wraps mid-insert
    (mixed-size inserts misalign the cursor)."""
    capacity = 96

    ref = np.zeros(capacity, np.int64)
    cursor = 0
    buf = replay.make_buffer(capacity)
    # 40-row inserts into a 96-slot ring: cursor 0 -> 40 -> 80 -> wraps at 120
    for i, n in enumerate([40, 40, 40, 40]):
        rows = make_rows(n, base=100 * (i + 1))
        buf = replay.insert_rows(buf, rows)
        flat = np.asarray(rows.action)
        idx = (cursor + np.arange(len(flat))) % capacity
        ref[idx] = flat
        cursor = (cursor + len(flat)) % capacity
    assert int(buf.cursor) == cursor
    assert int(buf.filled) == capacity
    np.testing.assert_array_equal(np.asarray(buf.action), ref)


def test_buffer_oversized_insert_resets_cursor_for_fifo():
    """A segment larger than the buffer keeps the newest ``capacity`` rows
    laid out oldest-first, so the cursor must reset to 0: the next insert
    has to evict the OLDEST surviving rows, not rows mid-segment
    (round-3 fix; reachable with num_envs=32768 vs buffer_size=1<<18)."""
    capacity = 64

    buf = replay.make_buffer(capacity)
    buf = replay.insert_rows(buf, make_rows(96, base=0))  # 96 > 64 rows
    assert int(buf.filled) == capacity
    assert int(buf.cursor) == 0
    # newest 64 of the 96 rows survive, oldest-first
    np.testing.assert_array_equal(np.asarray(buf.action), np.arange(32, 96))
    # a following small insert overwrites the oldest surviving rows (32..47)
    buf = replay.insert_rows(buf, make_rows(16, base=1000))
    expect = np.concatenate([np.arange(1000, 1016), np.arange(48, 96)])
    np.testing.assert_array_equal(np.asarray(buf.action), expect)
    assert int(buf.cursor) == 16


def test_nstep_fold_compact_equivalent():
    """nstep_fold_compact must agree with nstep_fold everywhere the TD
    target can see: reward_n/done_n exactly, obs_n/mask_n on live rows
    (done rows multiply the bootstrap by zero)."""
    rng = np.random.default_rng(0)
    S, n, B = 6, 3, 16
    L = S + n - 1
    obs_seq = rng.integers(0, 3, (L + 1, B, 117)).astype(np.int8)
    mask_seq = rng.random((L + 1, B, 54)) < 0.5
    action = rng.integers(0, 54, (L, B)).astype(np.int32)
    reward = rng.choice([-1.0, 0.0, 1.0], (L, B)).astype(np.float32)
    done = (rng.random((L, B)) < 0.2)

    old = replay.nstep_fold(
        replay.Segment(
            obs=jnp.asarray(obs_seq[:L]),
            action=jnp.asarray(action),
            reward=jnp.asarray(reward),
            done=jnp.asarray(done),
            obs_next=jnp.asarray(obs_seq[1:]),
            mask_next=jnp.asarray(mask_seq[1:]),
        ),
        n, 0.9,
    )
    old = jax.tree.map(lambda x: x[:S], old)
    new = replay.nstep_fold_compact(
        replay.CompactSegment(
            obs=jnp.asarray(obs_seq),
            mask=jnp.asarray(mask_seq),
            action=jnp.asarray(action),
            reward=jnp.asarray(reward),
            done=jnp.asarray(done),
        ),
        n, 0.9, S,
    )
    np.testing.assert_allclose(np.asarray(new.reward), np.asarray(old.reward), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(new.done), np.asarray(old.done))
    np.testing.assert_array_equal(np.asarray(new.obs), np.asarray(old.obs))
    np.testing.assert_array_equal(np.asarray(new.action), np.asarray(old.action))
    live = ~np.asarray(new.done)
    np.testing.assert_array_equal(
        np.asarray(new.obs_next)[live], np.asarray(old.obs_next)[live]
    )
    np.testing.assert_array_equal(
        np.asarray(new.mask_next)[live], np.asarray(old.mask_next)[live]
    )


def test_state_replay_derivation_bit_exact():
    """Round-4 replay redesign done-criterion: the state-storing ring
    reproduces the feature-storing pipeline BIT-EXACTLY — obs/obs_n/mask_n
    derived at sample time from the stored board snapshots equal the
    features the collector computed for the same states, on every row of a
    real engine trajectory (including episode resets inside the segment)."""
    from gobblet_rl_tpu.ops import batched_core as bc

    S, n_step, B = 8, 3, 64
    L = S + n_step - 1
    key = jax.random.PRNGKey(42)
    state = bc.reset_planes(B)
    boards, currents, obs_seq, mask_seq = [], [], [], []
    actions, rewards, dones = [], [], []
    for t in range(L + 1):
        boards.append(state.board)
        currents.append(state.current)
        obs_seq.append(dqn._obs_bf(state.board, state.current))
        mask_seq.append(bc.legal_mask_planes(state.board, state.current).T)
        if t < L:
            key, sub = jax.random.split(key)
            a = bc.sample_random_lm(sub, mask_seq[-1].T)
            s1 = bc.step_planes(state, a)
            actions.append(a)
            rewards.append(s1.rewards[0])
            dones.append(s1.done)
            state = bc.autoreset_planes(s1)
    assert np.asarray(jnp.stack(dones)).any(), "trajectory must contain resets"

    action = jnp.stack(actions)
    reward = jnp.stack(rewards)
    done = jnp.stack(dones)
    folded = replay.nstep_fold_compact(
        replay.CompactSegment(
            obs=jnp.stack(obs_seq), mask=jnp.stack(mask_seq),
            action=action, reward=reward, done=done,
        ),
        n_step, 0.9, S,
    )
    rows = replay.nstep_fold_state(
        replay.StateSegment(
            board=jnp.stack(boards), current=jnp.stack(currents),
            action=action, reward=reward, done=done,
        ),
        n_step, 0.9, S,
    )

    n = S * B
    np.testing.assert_allclose(
        np.asarray(rows.reward_n), np.asarray(folded.reward).reshape(n),
        atol=0,
    )
    np.testing.assert_array_equal(
        np.asarray(rows.done_n), np.asarray(folded.done).reshape(n)
    )
    np.testing.assert_array_equal(
        np.asarray(rows.action), np.asarray(folded.action).reshape(n)
    )
    obs_d, _ = replay.derive_features(rows.board, rows.current)
    np.testing.assert_array_equal(
        np.asarray(obs_d), np.asarray(folded.obs).reshape(n, 117)
    )
    obs_nd, mask_nd = replay.derive_features(rows.board_n, rows.current_n)
    np.testing.assert_array_equal(
        np.asarray(obs_nd), np.asarray(folded.obs_next).reshape(n, 117)
    )
    np.testing.assert_array_equal(
        np.asarray(mask_nd), np.asarray(folded.mask_next).reshape(n, 54)
    )

    # end-to-end through the ring + uniform sampler
    buf = replay.make_buffer(n)
    buf = replay.insert_rows(buf, rows)
    assert int(buf.filled) == n
    obs_s, act_s, r_s, d_s, obs_ns, mask_ns = replay.sample(
        buf, jax.random.PRNGKey(7), 128
    )
    # every sampled row must exist verbatim in the feature-path fold
    flat_obs = np.asarray(folded.obs).reshape(n, 117)
    got = np.asarray(obs_s)
    # reconstruct row ids from the stored action stream is ambiguous;
    # instead re-derive from the buffer rows the sampler indexed
    idx = jax.random.randint(
        jax.random.PRNGKey(7), (128,), 0, jnp.maximum(buf.filled, 1)
    )
    np.testing.assert_array_equal(got, flat_obs[np.asarray(idx)])
    np.testing.assert_array_equal(
        np.asarray(mask_ns),
        np.asarray(folded.mask_next).reshape(n, 54)[np.asarray(idx)],
    )
