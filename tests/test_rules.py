"""Rules-kernel parity: JAX core vs NumPy twin vs the upstream reference Board.

The oracle drives randomized legal playouts through the reference
``Board`` (/root/reference/gobblet_rl/game/board.py) and asserts that at
every ply our legal mask, flatboard, covered mask and winner agree exactly.
"""

import jax
import numpy as np
import pytest

from gobblet_rl_tpu.core import env as fenv
from gobblet_rl_tpu.core import observe, rules, rules_np
from gobblet_rl_tpu.core import types as T

from .ref_oracle import load_reference_board_cls

jit_legal = jax.jit(rules.legal_mask)
jit_step_raw = jax.jit(fenv.step_raw)


def ref_legal_mask(ref_board, player):
    return np.array(
        [ref_board.is_legal(a, player) for a in range(T.NUM_ACTIONS)], dtype=bool
    )


def random_ref_playout(seed, max_plies=60):
    """Yield (board27, player, pre-move masks) plies from a reference game."""
    Board = load_reference_board_cls()
    rng = np.random.default_rng(seed)
    b = Board()
    player = 0
    for _ in range(max_plies):
        yield b, player
        mask = ref_legal_mask(b, player)
        if not mask.any():
            return
        action = int(rng.choice(np.nonzero(mask)[0]))
        b.play_turn(player, action)
        if b.check_for_winner() != 0:
            yield b, 1 - player
            return
        player = 1 - player


@pytest.mark.parametrize("seed", range(8))
def test_playout_parity_vs_reference(seed):
    for ref_board, player in random_ref_playout(seed):
        board = ref_board.squares.reshape(3, 9).astype(np.int8)

        ref_mask = ref_legal_mask(ref_board, player)
        np.testing.assert_array_equal(rules_np.legal_mask(board, player), ref_mask)
        np.testing.assert_array_equal(
            np.asarray(jit_legal(board, np.int32(player))), ref_mask
        )

        np.testing.assert_array_equal(
            rules_np.flatboard(board), ref_board.get_flatboard().astype(np.int8)
        )
        np.testing.assert_array_equal(
            rules_np.covered(board).flatten(),
            ref_board.check_covered().astype(bool),
        )
        assert rules_np.line_winner(board) == ref_board.check_for_winner()
        assert int(rules.line_winner(board)) == ref_board.check_for_winner()


@pytest.mark.parametrize("seed", range(4))
def test_apply_action_parity_vs_reference(seed):
    Board = load_reference_board_cls()
    rng = np.random.default_rng(100 + seed)
    ref = Board()
    board = rules_np.empty_board()
    player = 0
    for _ in range(40):
        # Mix legal and arbitrary (possibly illegal) actions: play_turn must
        # be a silent no-op on illegal input (board.py:124-126).
        action = int(rng.integers(0, T.NUM_ACTIONS))
        ref.play_turn(player, action)
        prev = board
        board = rules_np.apply_action(prev, player, action)
        jboard = np.asarray(
            jax.jit(rules.apply_action)(prev, np.int32(player), np.int32(action))
        )
        np.testing.assert_array_equal(jboard, board)
        np.testing.assert_array_equal(
            board, ref.squares.reshape(3, 9).astype(np.int8)
        )
        if ref.check_for_winner() != 0:
            break
        player = 1 - player


def test_jax_np_step_agreement():
    """Full functional env: jax step_raw matches a numpy-driven replay."""
    rng = np.random.default_rng(7)
    state = jax.jit(fenv.reset)()
    board = rules_np.empty_board()
    player = 0
    for _ in range(50):
        mask = rules_np.legal_mask(board, player)
        if not mask.any() or bool(state.done):
            break
        action = int(rng.choice(np.nonzero(mask)[0]))
        state = jit_step_raw(state, action)
        board = rules_np.apply_action(board, player, action)
        np.testing.assert_array_equal(np.asarray(state.board), board)
        assert int(state.current) == 1 - player
        win = rules_np.line_winner(board)
        assert int(state.winner) == win
        if win != 0:
            np.testing.assert_array_equal(
                np.asarray(state.rewards), np.array([win, -win], np.float32)
            )
            break
        player = 1 - player


def test_observe_parity_vs_reference_env():
    """Observation planes + masks match the reference raw_env.observe."""
    from .ref_oracle import load_reference

    gobblet_rl = load_reference()
    renv = gobblet_rl.gobblet_v1.raw_env(render_mode=None)
    renv.reset()
    rng = np.random.default_rng(3)
    for _ in range(30):
        board = renv.board.squares.reshape(3, 9).astype(np.int8)
        cur = renv.agents.index(renv.agent_selection)
        for idx, agent in enumerate(renv.agents):
            ref_obs = renv.observe(agent)
            obs, mask = observe.observe_np(board, idx, cur)
            np.testing.assert_array_equal(obs, ref_obs["observation"])
            np.testing.assert_array_equal(mask, ref_obs["action_mask"])
            jobs, jmask = jax.jit(observe.observe)(
                board, np.int32(idx), np.int32(cur)
            )
            np.testing.assert_array_equal(np.asarray(jobs), ref_obs["observation"])
            np.testing.assert_array_equal(np.asarray(jmask), ref_obs["action_mask"])
        mask = renv.observe(renv.agent_selection)["action_mask"]
        if not mask.any() or all(renv.terminations.values()):
            break
        renv.step(int(rng.choice(np.nonzero(mask)[0])))


def test_golden_masks_trajectory():
    """Golden 5-ply trajectory from the reference integration test
    (/root/reference/tests/test_manual_policy_collector.py:49-507)."""
    board = rules_np.empty_board()

    # Start: every action legal.
    assert rules_np.legal_mask(board, 0).all()

    # P1 plays action 18 (first medium piece at pos 0).
    board = rules_np.apply_action(board, 0, 18)
    m = rules_np.legal_mask(board, 1)
    expected = np.ones(54, dtype=bool)
    expected[[0, 9, 18, 27]] = False
    np.testing.assert_array_equal(m, expected)

    # P2 plays action 36 (first large piece covers pos 0).
    board = rules_np.apply_action(board, 1, 36)
    m = rules_np.legal_mask(board, 0)
    expected = np.ones(54, dtype=bool)
    expected[[0, 9]] = False
    expected[18:28] = False
    expected[36] = False
    expected[45] = False
    np.testing.assert_array_equal(m, expected)

    # P1 plays action 28 (second medium at pos 1).
    board = rules_np.apply_action(board, 0, 28)
    m = rules_np.legal_mask(board, 1)
    expected = np.ones(54, dtype=bool)
    expected[[0, 1, 9, 10, 18, 19, 27, 28, 36, 45]] = False
    np.testing.assert_array_equal(m, expected)

    # P2 plays action 46 (second large covers pos 1).
    board = rules_np.apply_action(board, 1, 46)
    m = rules_np.legal_mask(board, 0)
    expected = np.zeros(54, dtype=bool)
    legal = [2, 3, 4, 5, 6, 7, 8, 11, 12, 13, 14, 15, 16, 17,
             38, 39, 40, 41, 42, 43, 44, 47, 48, 49, 50, 51, 52, 53]
    expected[legal] = True
    np.testing.assert_array_equal(m, expected)
    np.testing.assert_array_equal(np.nonzero(m)[0], np.array(legal))

    # P1 tries to move its covered medium piece (action 29): illegal no-op,
    # exact board tensor preserved (collector test :498-507).
    board2 = rules_np.apply_action(board, 0, 29)
    np.testing.assert_array_equal(board2, board)
    golden = np.array(
        [
            [[0, 0, 0], [0, 0, 0], [0, 0, 0]],
            [[3, 4, 0], [0, 0, 0], [0, 0, 0]],
            [[-5, -6, 0], [0, 0, 0], [0, 0, 0]],
        ],
        dtype=np.int8,
    )
    np.testing.assert_array_equal(board.reshape(3, 3, 3), golden)


def test_board_invariants():
    board = rules_np.empty_board()
    assert bool(rules.board_invariants_ok(board))
    board = rules_np.apply_action(board, 0, 18)
    assert bool(rules.board_invariants_ok(board))
    bad = board.copy()
    bad[1, 5] = 3  # piece 3 duplicated on its level
    assert not bool(rules.board_invariants_ok(bad))
    bad2 = rules_np.empty_board()
    bad2[0, 0] = 5  # large piece on the small level
    assert not bool(rules.board_invariants_ok(bad2))
