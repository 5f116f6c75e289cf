"""Native C++ engine: build, parity vs the NumPy kernel, throughput sanity."""

import numpy as np
import pytest

from gobblet_rl_tpu.core import rules_np

native = pytest.importorskip("gobblet_rl_tpu.native.engine")

if not native.available():  # no toolchain
    pytest.skip("native engine unavailable", allow_module_level=True)


def test_native_parity_random_playouts():
    eng = native.NativeEngine()
    rng = np.random.default_rng(0)
    for game in range(10):
        eng.reset()
        board = rules_np.empty_board()
        player = 0
        for _ in range(60):
            m_native = eng.legal_mask(player)
            m_np = rules_np.legal_mask(board, player)
            np.testing.assert_array_equal(m_native, m_np)

            action = int(rng.choice(np.nonzero(m_np)[0]))
            eng.apply(player, action)
            board = rules_np.apply_action(board, player, action)
            np.testing.assert_array_equal(eng.board.reshape(3, 9), board)
            assert eng.winner() == rules_np.line_winner(board)
            if eng.winner() != 0:
                break
            player = 1 - player


def test_native_illegal_noop():
    eng = native.NativeEngine()
    eng.reset()
    eng.apply(0, 0)
    snapshot = eng.board.copy()
    eng.apply(1, 0)          # equal size on occupied cell: illegal
    np.testing.assert_array_equal(eng.board, snapshot)
    eng.apply(1, 99)         # out of range: ignored
    eng.apply(1, -5)
    np.testing.assert_array_equal(eng.board, snapshot)


def test_native_greedy_beats_random():
    eng = native.NativeEngine()
    wins0, winners = eng.play_match(200, depth_p0=2, depth_p1=0, seed=3)
    decided = int((winners != 0).sum())
    assert decided > 150
    assert wins0 / decided > 0.9


def test_native_playout_throughput():
    eng = native.NativeEngine()
    eng.reset()
    import time

    t0 = time.perf_counter()
    episodes, winners = eng.random_playout(200_000, seed=7)
    dt = time.perf_counter() - t0
    steps_per_sec = 200_000 / dt
    assert episodes > 10_000
    # native single-core must beat the reference's ~265 steps/s by >100x
    assert steps_per_sec > 100_000, steps_per_sec


# ---------------------------------------------------------------------------
# Alpha-beta expert
# ---------------------------------------------------------------------------


def _random_midgame(rng, plies=6):
    """A legal non-terminal position reached by random play."""
    eng = native.NativeEngine()
    while True:
        eng.reset()
        player = 0
        for _ in range(plies):
            legal = np.nonzero(eng.legal_mask(player))[0]
            eng.apply(player, int(rng.choice(legal)))
            if eng.winner() != 0:
                break
            player = 1 - player
        if eng.winner() == 0:
            return eng, player


def test_alphabeta_action_always_legal():
    rng = np.random.default_rng(11)
    for trial in range(25):
        eng, player = _random_midgame(rng, plies=int(rng.integers(0, 12)))
        a = eng.alphabeta_action(player, depth=4, salt=trial)
        assert eng.is_legal(player, a), (trial, a)


def test_alphabeta_takes_immediate_win_and_blocks_loss():
    rng = np.random.default_rng(23)
    checked_win = 0
    for trial in range(300):
        eng, player = _random_midgame(rng, plies=int(rng.integers(4, 14)))
        sign = 1 if player == 0 else -1
        legal = np.nonzero(eng.legal_mask(player))[0]
        wins = []
        for a in legal:
            nxt = native.NativeEngine()
            nxt.board[:] = eng.board
            nxt.apply(player, int(a))
            if nxt.winner() == sign:
                wins.append(int(a))
        if not wins:
            continue
        chosen = eng.alphabeta_action(player, depth=2, salt=trial)
        nxt = native.NativeEngine()
        nxt.board[:] = eng.board
        nxt.apply(player, chosen)
        assert nxt.winner() == sign, (trial, chosen, wins)
        checked_win += 1
        if checked_win >= 10:
            break
    assert checked_win >= 5  # the sampler found enough tactical positions


def test_alphabeta_beats_greedy2_native_match():
    eng = native.NativeEngine()
    # kind 2 = alphabeta, kind 1 = greedy; color-swapped halves
    w0, winners0 = eng.play_match2(20, 2, 4, 1, 2, seed=5)
    w1, winners1 = eng.play_match2(20, 1, 2, 2, 4, seed=9)
    ab_wins = w0 + int((winners1 == -1).sum())
    decided = int((winners0 != 0).sum()) + int((winners1 != 0).sum())
    assert decided >= 30
    assert ab_wins / decided > 0.8, (ab_wins, decided)


# ---------------------------------------------------------------------------
# Exact solver (ground-truth oracle)
# ---------------------------------------------------------------------------


def _sign(player):
    return 1 if player == 0 else -1


def _win_within(board, player, d):
    """Pure-Python reference: player to move forces a win within d plies."""
    if d <= 0:
        return False
    for a in np.nonzero(rules_np.legal_mask(board, player))[0]:
        child = rules_np.apply_action(board, player, int(a))
        w = rules_np.line_winner(child)
        if w == _sign(player):
            return True
        if w == -_sign(player):
            continue  # self-uncovering loss: not a winning line
        if _lose_within(child, 1 - player, d - 1):
            return True
    return False


def _lose_within(board, player, d):
    """Every move of `player` ends with them losing within d plies."""
    if d <= 0:
        return False
    for a in np.nonzero(rules_np.legal_mask(board, player))[0]:
        child = rules_np.apply_action(board, player, int(a))
        w = rules_np.line_winner(child)
        if w == _sign(player):
            return False
        if w == -_sign(player):
            continue  # this option loses immediately; others may not
        if d <= 1 or not _win_within(child, 1 - player, d - 1):
            return False
    return True


def test_solver_agrees_with_python_bruteforce_depth3():
    """Independent-implementation check of the solver's minimax core:
    proven win/loss classification at depth 3 must match an exhaustive
    pure-Python search over the NumPy rules twin."""
    rng = np.random.default_rng(37)
    for trial in range(8):
        eng, player = _random_midgame(rng, plies=int(rng.integers(4, 12)))
        board = eng.board.reshape(3, 9).copy()
        r = native.solve(eng.board, player, max_depth=3)
        py_win = _win_within(board, player, 3)
        py_lose = _lose_within(board, player, 3)
        assert (r["proven"] and r["score"] > 0) == py_win, (trial, r)
        assert (r["proven"] and r["score"] < 0) == py_lose, (trial, r)
        if r["proven"]:
            assert r["mate_in"] <= 3


def test_solver_mate_in_one():
    eng = native.NativeEngine()
    eng.reset()
    # white builds two-in-a-row with the big pieces; black dawdles in a corner
    eng.apply(0, 36 + 0)   # white big (piece 5) at cell 0
    eng.apply(1, 45 + 8)   # black big (piece 6) at cell 8
    eng.apply(0, 45 + 1)   # white's other big (piece 6) at cell 1
    eng.apply(1, 27 + 7)   # black medium (piece 4) at cell 7
    # white: bigs on 0 and 1 of line {0,1,2}; cell 2 is empty -> mate in 1
    r = native.solve(eng.board, player=0, max_depth=4)
    assert r["proven"] and r["score"] > 0 and r["mate_in"] == 1, r
    # the returned move must actually win
    nxt = native.NativeEngine()
    nxt.board[:] = eng.board
    nxt.apply(0, r["move"])
    assert nxt.winner() == 1


@pytest.mark.slow
def test_opening_is_proven_first_player_win_in_13():
    """Ground truth: 3x3 Gobblet under the reference's rules is a forced
    first-player win in 13 plies (exact solve, docs/RESULTS.md)."""
    r = native.solve(max_depth=13)
    assert r["proven"] and r["score"] > 0, r
    assert r["mate_in"] == 13, r
    native.solve_tt_clear()


@pytest.mark.slow
def test_solver_converts_won_opening_vs_alphabeta_defense():
    """Perfect play converts the proven win against a strong defense, always
    within the proven 13-ply horizon."""
    lib = native.load()
    for g in range(8):
        b = np.zeros(27, np.int8)
        player, w, plies = 0, 0, 0
        for _ in range(20):
            if player == 0:
                a = int(lib.gob_solve_action(b, 0, 15, 1000 + g))
            else:
                a = int(lib.gob_alphabeta_action(b, 1, 6, 2000 + g))
            lib.gob_apply(b, player, a)
            plies += 1
            w = int(lib.gob_winner(b))
            if w != 0:
                break
            player = 1 - player
        assert w == 1 and plies <= 13, (g, w, plies)


def test_alphabeta_tournament_policy_beats_random():
    import jax

    from gobblet_rl_tpu.eval import tournament

    res = tournament.play_match(
        tournament.alphabeta_policy(depth=3),
        tournament.random_policy(),
        num_games=32,
        seed=0,
    )
    assert res["win_rate"] > 0.9, res
    del jax


def test_alphabeta_host_policy_full_game():
    # vs random: two alpha-beta agents can cycle forever (Gobblet has no
    # repetition rule), so a decisive game needs an imperfect opponent.
    from gobblet_rl_tpu import gobblet_v1
    from gobblet_rl_tpu.policies import (
        AlphaBetaGobbletPolicy,
        RandomAdmissiblePolicy,
    )

    env = gobblet_v1.env(render_mode=None)
    env.reset(seed=4)
    expert_seat = env.possible_agents[0]
    pol = {
        env.possible_agents[0]: AlphaBetaGobbletPolicy(depth=3, seed=0),
        env.possible_agents[1]: RandomAdmissiblePolicy(seed=1),
    }
    final_rewards = {}
    for agent in env.agent_iter(max_iter=300):
        obs, reward, term, trunc, info = env.last()
        if term or trunc:
            action = None
        else:
            action = pol[agent].compute_action(obs["observation"],
                                               obs["action_mask"])
            assert obs["action_mask"][action] == 1
        env.step(action)
        for a, r in env.rewards.items():  # per-step rewards; sum over plies
            final_rewards[a] = final_rewards.get(a, 0) + r
    assert final_rewards[expert_seat] == 1, final_rewards
