"""Exhaustive cross-implementation parity on the full depth-2 game tree.

Enumerates EVERY position reachable in two plies (54 x legal replies,
~2.9k distinct positions) and asserts that all four rule implementations
(NumPy twin, per-env JAX, lane-major batched JAX, native C++) agree exactly
on legal masks, flatboards and winners — plus a sampled deep-position sweep
from random playouts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gobblet_rl_tpu.core import rules, rules_np
from gobblet_rl_tpu.ops import batched_core as bc

try:
    from gobblet_rl_tpu.native import engine as native_engine

    HAVE_NATIVE = native_engine.available()
except Exception:  # pragma: no cover
    HAVE_NATIVE = False


def _enumerate_depth2():
    """All (board, player-to-move) states after exactly 2 legal plies."""
    seen = {}
    root = rules_np.empty_board()
    for a1 in range(54):
        b1 = rules_np.apply_action(root, 0, a1)
        mask2 = rules_np.legal_mask(b1, 1)
        for a2 in np.nonzero(mask2)[0]:
            b2 = rules_np.apply_action(b1, 1, int(a2))
            seen[b2.tobytes()] = b2
    return list(seen.values())


def _check_batch(boards, player):
    """Cross-check all implementations on a batch of boards."""
    n = len(boards)
    batch_bf = jnp.asarray(np.stack(boards))                  # [n, 3, 9]
    batch_lm = jnp.transpose(batch_bf, (1, 2, 0))             # [3, 9, n]
    players = jnp.full(n, player, jnp.int32)

    masks_jax = np.asarray(jax.jit(rules.batched_legal_mask)(batch_bf, players))
    masks_lm = np.asarray(jax.jit(bc.legal_mask_planes)(batch_lm, players)).T
    flats_lm = np.asarray(jax.jit(bc.flat_planes)(batch_lm)).T
    winners_lm = np.asarray(
        jax.jit(lambda b: bc.winner_planes(bc.flat_planes(b)))(batch_lm)
    )

    eng = native_engine.NativeEngine() if HAVE_NATIVE else None
    for i, board in enumerate(boards):
        m_np = rules_np.legal_mask(board, player)
        np.testing.assert_array_equal(masks_jax[i], m_np)
        np.testing.assert_array_equal(masks_lm[i], m_np)
        np.testing.assert_array_equal(flats_lm[i], rules_np.flatboard(board))
        assert winners_lm[i] == rules_np.line_winner(board)
        if eng is not None:
            eng.board[:] = board.flatten()
            np.testing.assert_array_equal(eng.legal_mask(player), m_np)
            assert eng.winner() == rules_np.line_winner(board)


def test_depth2_exhaustive_parity():
    boards = _enumerate_depth2()
    assert len(boards) > 2500
    _check_batch(boards, player=0)


def test_deep_positions_sampled_parity():
    """Random deep positions (10-30 plies) across many games."""
    rng = np.random.default_rng(0)
    boards = []
    for g in range(40):
        b = rules_np.empty_board()
        player = 0
        depth = int(rng.integers(10, 30))
        for _ in range(depth):
            mask = rules_np.legal_mask(b, player)
            b = rules_np.apply_action(b, player, int(rng.choice(np.nonzero(mask)[0])))
            if rules_np.line_winner(b) != 0:
                break
            player = 1 - player
        boards.append(b)
    _check_batch(boards, player=0)
    _check_batch(boards, player=1)


def test_depth3_sampled_exhaustive_parity():
    """Round-3 extension beyond the full depth-2 tree: sample depth-2
    positions and expand ALL of their depth-3 children, cross-checking the
    four implementations on every child (player 0 to move next)."""
    rng = np.random.default_rng(7)
    depth2 = _enumerate_depth2()
    sample = [depth2[i] for i in rng.choice(len(depth2), 120, replace=False)]
    seen = {}
    for b2 in sample:
        for a3 in np.nonzero(rules_np.legal_mask(b2, 0))[0]:
            b3 = rules_np.apply_action(b2, 0, int(a3))
            seen[b3.tobytes()] = b3
    boards = list(seen.values())
    assert len(boards) > 2000
    _check_batch(boards, player=1)


def test_random_prefix_lockstep_parity():
    """Any-depth prefix equivalence (property fuzz): play random games to
    termination stepping all implementations in lockstep with the same
    action stream — full board, mask, current-player and winner agreement
    at EVERY ply, not just at sampled snapshots."""
    rng = np.random.default_rng(11)
    G = 32
    np_boards = [rules_np.empty_board() for _ in range(G)]
    players = np.zeros(G, np.int32)
    finished = np.zeros(G, bool)
    state = bc.reset_planes(G)
    step_lm = jax.jit(bc.step_planes)
    mask_jax = jax.jit(rules.batched_legal_mask)
    engines = [native_engine.NativeEngine() for _ in range(G)] if HAVE_NATIVE else None

    for ply in range(48):
        if finished.all():
            break
        # per-ply mask parity on live games (all four implementations)
        masks_np = np.stack([rules_np.legal_mask(b, int(p))
                             for b, p in zip(np_boards, players)])
        mj = np.asarray(mask_jax(jnp.asarray(np.stack(np_boards)),
                                 jnp.asarray(players)))
        ml = np.asarray(jax.jit(bc.legal_mask_planes)(
            jnp.transpose(jnp.asarray(np.stack(np_boards)), (1, 2, 0)),
            jnp.asarray(players))).T
        for g in range(G):
            if finished[g]:
                continue
            np.testing.assert_array_equal(mj[g], masks_np[g])
            np.testing.assert_array_equal(ml[g], masks_np[g])
            if engines is not None:
                np.testing.assert_array_equal(
                    engines[g].legal_mask(int(players[g])), masks_np[g])

        actions = np.zeros(G, np.int32)
        for g in range(G):
            if not finished[g]:
                actions[g] = int(rng.choice(np.nonzero(masks_np[g])[0]))
        state = step_lm(state, jnp.asarray(actions))
        lm_boards = np.asarray(state.board).transpose(2, 0, 1)
        lm_winner = np.asarray(state.winner)
        lm_current = np.asarray(state.current)

        for g in range(G):
            if finished[g]:
                continue
            np_boards[g] = rules_np.apply_action(
                np_boards[g], int(players[g]), int(actions[g]))
            np.testing.assert_array_equal(lm_boards[g], np_boards[g])
            w = rules_np.line_winner(np_boards[g])
            assert int(lm_winner[g]) == w, (ply, g)
            if engines is not None:
                engines[g].apply(int(players[g]), int(actions[g]))
                np.testing.assert_array_equal(
                    engines[g].board.reshape(3, 9), np_boards[g])
                assert engines[g].winner() == w
            if w != 0:
                finished[g] = True
            else:
                players[g] = 1 - players[g]
                assert int(lm_current[g]) == players[g], (ply, g)
    assert finished.sum() >= G // 2  # most random games end within 48 plies
