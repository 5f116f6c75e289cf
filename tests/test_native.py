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
