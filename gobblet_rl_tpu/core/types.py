"""Core types and constants for the TPU-native Gobblet engine.

The board encoding mirrors the reference semantics
(/root/reference/gobblet_rl/game/board.py:5-34) but is re-designed for
fixed-shape, branch-free array programs:

* the board is an ``int8[3, 9]`` array — ``board[level, pos]`` holds the signed
  piece id occupying ``pos`` (0-8, column-major display order) at stacking
  ``level`` (0=small, 1=medium, 2=large);
* piece ids are 1..6 for player 0 and -1..-6 for player 1
  (1-2 small, 3-4 medium, 5-6 large), each id appearing at most once;
* actions are ``Discrete(54)``: ``action = pos + 9 * (piece - 1)``
  (reference board.py:42-79).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Static sizes
# ---------------------------------------------------------------------------
NUM_CELLS = 9          # 3x3 grid, column-major indexing (board.py:14-17)
NUM_LEVELS = 3         # piece sizes: small / medium / large
NUM_PIECES = 6         # per player: two of each size
NUM_ACTIONS = NUM_CELLS * NUM_PIECES  # 54 (gobblet.py:140)
NUM_AGENTS = 2
OBS_CHANNELS = 13      # 12 one-hot piece planes + agent plane (gobblet.py:189-206)

# ---------------------------------------------------------------------------
# Per-action lookup tables (host numpy; wrapped to jnp lazily by rules.py)
# ---------------------------------------------------------------------------
_A = np.arange(NUM_ACTIONS)
ACTION_POS_NP = (_A % NUM_CELLS).astype(np.int32)            # 0..8
ACTION_PIECE_NP = (_A // NUM_CELLS + 1).astype(np.int32)     # 1..6
ACTION_SIZE_NP = ((ACTION_PIECE_NP + 1) // 2).astype(np.int32)   # 1..3
ACTION_LEVEL_NP = (ACTION_SIZE_NP - 1).astype(np.int32)      # 0..2

# Per-piece lookup tables (piece ids 1..6 -> index 0..5)
_P = np.arange(1, NUM_PIECES + 1)
PIECE_SIZE_NP = ((_P + 1) // 2).astype(np.int32)             # 1..3
PIECE_LEVEL_NP = (PIECE_SIZE_NP - 1).astype(np.int32)        # 0..2

# Win lines over the flat 3x3 board, in the exact scan order of the reference
# (board.py:135-153): three "vertical" (0,1,2)... then "horizontal" (0,3,6)...
# then the two diagonals.  Order matters: check_for_winner overwrites `winner`
# per matching line (board.py:183-194), so the LAST matching line decides.
WIN_LINES_NP = np.array(
    [
        [0, 1, 2], [3, 4, 5], [6, 7, 8],
        [0, 3, 6], [1, 4, 7], [2, 5, 8],
        [0, 4, 8], [2, 4, 6],
    ],
    dtype=np.int32,
)


class GobbletState(NamedTuple):
    """Immutable environment state (a pytree; add a leading axis to batch).

    Mirrors the mutable fields of the reference ``raw_env``
    (gobblet.py:132-167, 275-290) as fixed-shape arrays.
    """

    board: jnp.ndarray        # int8[3, 9] signed piece ids
    current: jnp.ndarray      # int32 scalar, agent to move (0 or 1)
    turn: jnp.ndarray         # int32 scalar, steps taken (gobblet.py:270)
    done: jnp.ndarray         # bool scalar, game over (all agents terminate)
    winner: jnp.ndarray       # int8 scalar: 0 none, +1 agent0, -1 agent1
    last_action: jnp.ndarray  # int32 scalar, -1 before first move
    rewards: jnp.ndarray      # float32[2], reward emitted by the last step


def zeros_state() -> GobbletState:
    """A fresh host-side (numpy) start state (gobblet.py:275-290)."""
    return GobbletState(
        board=np.zeros((NUM_LEVELS, NUM_CELLS), dtype=np.int8),
        current=np.int32(0),
        turn=np.int32(0),
        done=np.bool_(False),
        winner=np.int8(0),
        last_action=np.int32(-1),
        rewards=np.zeros(2, dtype=np.float32),
    )
