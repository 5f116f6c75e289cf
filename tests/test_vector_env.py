"""Batched vector env: semantics, auto-reset, fused rollout, vmap-vs-AEC parity."""

import jax
import jax.numpy as jnp
import numpy as np

from gobblet_rl_tpu.core import rules_np
from gobblet_rl_tpu.env import vector


def test_vector_reset_shapes():
    states, ts = vector.vector_reset(16)
    assert states.board.shape == (3, 9, 16)
    assert ts.obs.shape == (16, 3, 3, 13)
    assert ts.mask.shape == (16, 54)
    assert bool(ts.mask.all())
    assert not bool(ts.done.any())


def test_vector_step_matches_host_replay():
    """Drive 8 envs with recorded random action streams; every env must match
    an independent host-side numpy replay (terminate-illegal semantics)."""
    B, S = 8, 40
    rng = np.random.default_rng(0)
    states, ts = vector.vector_reset(B)

    host_boards = [rules_np.empty_board() for _ in range(B)]
    host_player = [0] * B
    host_done = [False] * B

    for step_i in range(S):
        actions = np.zeros(B, np.int32)
        masks = np.asarray(ts.mask)
        for b in range(B):
            legal = np.nonzero(masks[b])[0]
            actions[b] = rng.choice(legal)
        states, ts = vector.vector_step(states, jnp.asarray(actions))

        dev_boards = np.transpose(np.asarray(states.board), (2, 0, 1))
        for b in range(B):
            if host_done[b]:
                # env auto-reset previously; replay fresh
                host_boards[b] = rules_np.empty_board()
                host_player[b] = 0
                host_done[b] = False
            a = int(actions[b])
            assert rules_np.legal_mask(host_boards[b], host_player[b])[a]
            host_boards[b] = rules_np.apply_action(host_boards[b], host_player[b], a)
            w = rules_np.line_winner(host_boards[b])
            if w != 0:
                assert bool(ts.done[b]) and int(ts.winner[b]) == w
                np.testing.assert_array_equal(
                    np.asarray(ts.rewards[b]), np.array([w, -w], np.float32)
                )
                host_done[b] = True
                # auto-reset already applied on device
                np.testing.assert_array_equal(dev_boards[b], rules_np.empty_board())
            else:
                assert not bool(ts.done[b])
                host_player[b] = 1 - host_player[b]
                np.testing.assert_array_equal(dev_boards[b], host_boards[b])


def test_fused_rollout_statistics():
    B, S = 256, 64
    states, ts = vector.vector_reset(B)
    key = jax.random.PRNGKey(0)
    states, ts, key, stats = vector.rollout(
        states, key, ts, vector.random_policy, S
    )
    episodes = int(stats["episodes"])
    wins = int(stats["wins_p1"]) + int(stats["wins_p2"])
    assert episodes == wins  # random-admissible play never ends illegally
    assert episodes > B  # plenty of short games in 64 plies x 256 envs
    # random play mildly favors the first mover but both players win
    assert int(stats["wins_p1"]) > 0 and int(stats["wins_p2"]) > 0


def test_rollout_collect_shapes():
    B, S = 32, 16
    states, ts = vector.vector_reset(B)
    key = jax.random.PRNGKey(1)
    _, _, _, steps = vector.rollout(
        states, key, ts, vector.random_policy, S, collect=True
    )
    assert steps.obs.shape == (S, B, 3, 3, 13)
    assert steps.rewards.shape == (S, B, 2)
    assert steps.done.shape == (S, B)
