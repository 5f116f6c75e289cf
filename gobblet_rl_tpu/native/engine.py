"""ctypes bindings for the native C++ rules engine (csrc/gobblet.cpp).

The shared library is built on demand with the in-tree Makefile (g++); if no
toolchain is available the import raises and callers fall back to the NumPy
kernels.  Parity with the JAX/NumPy cores is asserted in
tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgobblet.so")
_CSRC = os.path.abspath(os.path.join(_DIR, "..", "..", "csrc"))

_lib = None


def _build() -> None:
    subprocess.run(["make", "-C", _CSRC], check=True, capture_output=True)


def load():
    """Load (building if needed) the native library; cached."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        _build()
    lib = ctypes.CDLL(_SO)
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    lib.gob_reset.argtypes = [i8p]
    lib.gob_legal_mask.restype = ctypes.c_uint64
    lib.gob_legal_mask.argtypes = [i8p, ctypes.c_int]
    lib.gob_is_legal.restype = ctypes.c_int
    lib.gob_is_legal.argtypes = [i8p, ctypes.c_int, ctypes.c_int]
    lib.gob_apply.argtypes = [i8p, ctypes.c_int, ctypes.c_int]
    lib.gob_winner.restype = ctypes.c_int
    lib.gob_winner.argtypes = [i8p]
    lib.gob_greedy_action.restype = ctypes.c_int
    lib.gob_greedy_action.argtypes = [
        i8p, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint64)
    ]
    lib.gob_random_playout.restype = ctypes.c_long
    lib.gob_random_playout.argtypes = [
        i8p, ctypes.POINTER(ctypes.c_int), ctypes.c_long, ctypes.c_uint64, i8p
    ]
    lib.gob_play_match.restype = ctypes.c_int
    lib.gob_play_match.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, i8p,
    ]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.gob_alphabeta_action.restype = ctypes.c_int
    lib.gob_alphabeta_action.argtypes = [
        i8p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64
    ]
    lib.gob_alphabeta_batch.argtypes = [
        i8p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64, i32p
    ]
    lib.gob_play_match2.restype = ctypes.c_int
    lib.gob_play_match2.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int, i8p,
    ]
    lib.gob_solve.restype = ctypes.c_long
    lib.gob_solve.argtypes = [
        i8p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.gob_solve_tt_clear.argtypes = []
    lib.gob_solve_action.restype = ctypes.c_int
    lib.gob_solve_action.argtypes = [
        i8p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64
    ]
    lib.gob_solve_batch.argtypes = [
        i8p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64, i32p
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


class NativeEngine:
    """Single-env engine over the C core (board is int8[27] level-major)."""

    def __init__(self):
        self.lib = load()
        self.board = np.zeros(27, np.int8)
        self.rng_state = ctypes.c_uint64(0x9E3779B97F4A7C15)

    def seed(self, seed: int) -> None:
        self.rng_state = ctypes.c_uint64((seed << 1) | 1)

    def reset(self) -> None:
        self.lib.gob_reset(self.board)

    def legal_mask(self, player: int) -> np.ndarray:
        bits = int(self.lib.gob_legal_mask(self.board, player))
        return (bits >> np.arange(54)) & 1 == 1

    def is_legal(self, player: int, action: int) -> bool:
        return bool(self.lib.gob_is_legal(self.board, player, action))

    def apply(self, player: int, action: int) -> None:
        self.lib.gob_apply(self.board, player, action)

    def winner(self) -> int:
        return int(self.lib.gob_winner(self.board))

    def greedy_action(self, player: int, depth: int = 2) -> int:
        return int(
            self.lib.gob_greedy_action(
                self.board, player, depth, ctypes.byref(self.rng_state)
            )
        )

    def random_playout(self, num_steps: int, seed: int = 1):
        """Run num_steps random-admissible plies in native code; returns
        (episodes, per-step winners)."""
        player = ctypes.c_int(0)
        winners = np.zeros(num_steps, np.int8)
        episodes = self.lib.gob_random_playout(
            self.board, ctypes.byref(player), num_steps, seed, winners
        )
        return int(episodes), winners

    def play_match(self, num_games: int, depth_p0: int, depth_p1: int,
                   seed: int = 1, max_plies: int = 200):
        winners = np.zeros(num_games, np.int8)
        wins0 = self.lib.gob_play_match(
            num_games, depth_p0, depth_p1, seed, max_plies, winners
        )
        return int(wins0), winners

    def alphabeta_action(self, player: int, depth: int = 6,
                         salt: int = 1) -> int:
        """Iterative-deepening alpha-beta move for the current board."""
        return int(
            self.lib.gob_alphabeta_action(self.board, player, depth, salt)
        )

    def play_match2(self, num_games: int, kind_p0: int, depth_p0: int,
                    kind_p1: int, depth_p1: int, seed: int = 1,
                    max_plies: int = 200):
        """Scripted-agent match; kind 0=random, 1=greedy, 2=alphabeta."""
        winners = np.zeros(num_games, np.int8)
        wins0 = self.lib.gob_play_match2(
            num_games, kind_p0, depth_p0, kind_p1, depth_p1, seed,
            max_plies, winners
        )
        return int(wins0), winners


def solve(board: np.ndarray | None = None, player: int = 0,
          max_depth: int = 30) -> dict:
    """Exact-solve a position (default: the opening) with the native
    ground-truth solver.  Returns ``{move, score, proven, mate_in, depth,
    nodes}``; ``proven`` means the score is a forced win/loss within the
    horizon (mate scale |score| = 30000 - plies-to-mate)."""
    lib = load()
    if board is None:
        board = np.zeros(27, np.int8)
    board = np.ascontiguousarray(board, np.int8)
    move = ctypes.c_int32()
    score = ctypes.c_int32()
    proven = ctypes.c_int32()
    depth = ctypes.c_int32()
    nodes = lib.gob_solve(board, player, max_depth, ctypes.byref(move),
                          ctypes.byref(score), ctypes.byref(proven),
                          ctypes.byref(depth))
    s = int(score.value)
    return {
        "move": int(move.value),
        "score": s,
        "proven": bool(proven.value),
        "mate_in": (30000 - abs(s)) if abs(s) > 29000 else None,
        "depth": int(depth.value),
        "nodes": int(nodes),
    }


def solve_tt_clear() -> None:
    """Release the solver's 2 GiB transposition table (128M entries)."""
    if _lib is not None:
        _lib.gob_solve_tt_clear()


def solve_batch(boards: np.ndarray, players: np.ndarray,
                depth: int = 20, seed: int = 1) -> np.ndarray:
    """Exact-solver moves for a batch of positions (the oracle as a policy;
    shape contract matches :func:`alphabeta_batch`)."""
    lib = load()
    boards = np.ascontiguousarray(boards, np.int8).reshape(-1, 27)
    players = np.ascontiguousarray(players, np.int32)
    out = np.zeros(boards.shape[0], np.int32)
    lib.gob_solve_batch(
        boards, players, boards.shape[0], depth, int(seed) & (2**64 - 1), out
    )
    return out


def alphabeta_batch(boards: np.ndarray, players: np.ndarray,
                    depth: int = 6, seed: int = 1) -> np.ndarray:
    """Alpha-beta moves for a batch of positions (int8[B,27] level-major,
    int32[B] players); the jax.pure_callback entry used by
    eval.tournament.alphabeta_policy."""
    lib = load()
    boards = np.ascontiguousarray(boards, np.int8).reshape(-1, 27)
    players = np.ascontiguousarray(players, np.int32)
    out = np.zeros(boards.shape[0], np.int32)
    lib.gob_alphabeta_batch(
        boards, players, boards.shape[0], depth, int(seed) & (2**64 - 1), out
    )
    return out
