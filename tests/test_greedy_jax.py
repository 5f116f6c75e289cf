"""Batched jittable greedy: tactical correctness + strength vs random."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gobblet_rl_tpu.core import rules_np
from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.policies import greedy_jax


def _planes_from_boards(boards):
    return jnp.asarray(np.stack(boards, axis=-1))  # [3,9,B]


def test_takes_immediate_win():
    # P1 has small pieces at cells 0,1 — playing any piece at cell 2 wins.
    b = rules_np.empty_board()
    b = rules_np.apply_action(b, 0, 0)      # small1 @0
    b = rules_np.apply_action(b, 1, 8)      # opp
    b = rules_np.apply_action(b, 0, 10)     # small2 @1
    b = rules_np.apply_action(b, 1, 16)     # opp
    board = _planes_from_boards([b])
    action = greedy_jax.greedy_actions(
        jax.random.PRNGKey(0), board, jnp.zeros(1, jnp.int32), depth=2
    )
    a = int(action[0])
    assert a % 9 == 2  # completes the 0,1,2 line
    nb = rules_np.apply_action(b, 0, a)
    assert rules_np.line_winner(nb) == 1


def test_blocks_opponent_win():
    # Opponent (p2) threatens cells 0,1 with larges; p1 must stop cell 2
    # (cover/occupy) or lose; depth-2 must avoid handing the win.
    b = rules_np.empty_board()
    b = rules_np.apply_action(b, 1, 36)     # p2 large1 @0
    b = rules_np.apply_action(b, 1, 46)     # p2 large2 @1
    b = rules_np.apply_action(b, 0, 8)      # p1 small @8
    board = _planes_from_boards([b])
    for seed in range(5):
        action = greedy_jax.greedy_actions(
            jax.random.PRNGKey(seed), board, jnp.zeros(1, jnp.int32), depth=2
        )
        a = int(action[0])
        nb = rules_np.apply_action(b, 0, a)
        # after our move, opponent must have no winning reply
        opp_mask = rules_np.legal_mask(nb, 1)
        for r in np.nonzero(opp_mask)[0]:
            rb = rules_np.apply_action(nb, 1, int(r))
            assert rules_np.line_winner(rb) != -1, (a, r)


@pytest.mark.parametrize("greedy_player", [0, 1])
def test_greedy_beats_random(greedy_player):
    B, S = 64, 60
    state = bc.reset_planes(B)
    key = jax.random.PRNGKey(0)
    wins = {"greedy": 0, "random": 0}

    @jax.jit
    def ply(state, key):
        kg, kr, key = jax.random.split(key, 3)
        mask = bc.legal_mask_planes(state.board, state.current)
        a_greedy = greedy_jax.greedy_actions(kg, state.board, state.current, 2)
        a_random = bc.sample_random_lm(kr, mask)
        actions = jnp.where(state.current == greedy_player, a_greedy, a_random)
        stepped = bc.step_planes(state, actions)
        return bc.autoreset_planes(stepped), stepped.winner, key

    greedy_sign = 1 if greedy_player == 0 else -1
    for _ in range(S):
        state, winner, key = ply(state, key)
        w = np.asarray(winner)
        wins["greedy"] += int((w == greedy_sign).sum())
        wins["random"] += int((w == -greedy_sign).sum())

    total = wins["greedy"] + wins["random"]
    assert total > 0
    win_rate = wins["greedy"] / total
    assert win_rate > 0.9, wins
