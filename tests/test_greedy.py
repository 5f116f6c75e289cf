"""Greedy baseline parity: our policy must pick the reference's exact move.

Drives seeded greedy-vs-greedy games on the reference env; at every ply both
the upstream ``GreedyGobbletPolicy`` and ours see the same observation and
the same global-numpy RNG state, and must return the same action — across
depths 1, 2 and 3 (the full decision tree incl. prune/steal/block branches
and the depth-3 replay quirk, greedy_policy.py:84-219).
"""

import numpy as np
import pytest

from gobblet_rl_tpu.policies.greedy import GreedyGobbletPolicy, board_from_observation

from .ref_oracle import load_reference


def _run_parity(depth, seed):
    ref_pkg = load_reference()
    from gobblet_rl.game.greedy_policy import GreedyGobbletPolicy as RefGreedy

    env = ref_pkg.gobblet_v1.env(render_mode=None)
    env.reset()
    ref_pol = RefGreedy(depth=depth)
    our_pol = GreedyGobbletPolicy(depth=depth)

    np.random.seed(seed)
    plies = 0
    while env.agents and plies < 50:
        obs, _, term, trunc, _ = env.last()
        if term or trunc:
            env.step(None)
            continue
        rng_state = np.random.get_state()
        ref_action = ref_pol.compute_action(obs["observation"], obs["action_mask"])
        np.random.set_state(rng_state)
        our_action = our_pol.compute_action(obs["observation"], obs["action_mask"])
        assert int(our_action) == int(ref_action), (
            f"divergence at ply {plies}: ours={int(our_action)} ref={int(ref_action)}"
        )
        env.step(int(ref_action))
        plies += 1
    env.close()


@pytest.mark.parametrize("depth", [1, 2])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_greedy_move_parity(depth, seed):
    _run_parity(depth, seed)


@pytest.mark.slow
def test_greedy_move_parity_depth3():
    """Depth-3 parity: ~3 min/game because the *reference* search is that
    slow; run with ``-m slow``.  Verified passing (full-game lockstep)."""
    _run_parity(3, 0)


def test_board_reconstruction_roundtrip():
    """Observation -> board reconstruction inverts the observe kernel."""
    from gobblet_rl_tpu.core import observe, rules_np

    rng = np.random.default_rng(5)
    board = rules_np.empty_board()
    player = 0
    for _ in range(20):
        mask = rules_np.legal_mask(board, player)
        for idx in range(2):
            obs, _ = observe.observe_np(board, idx, player)
            rec, agent_idx = board_from_observation(obs)
            np.testing.assert_array_equal(rec, board)
            assert agent_idx == idx
        action = int(rng.choice(np.nonzero(mask)[0]))
        board = rules_np.apply_action(board, player, action)
        if rules_np.line_winner(board) != 0:
            break
        player = 1 - player
