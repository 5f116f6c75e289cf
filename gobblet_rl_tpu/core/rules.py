"""Branch-free JAX rules kernel for Gobblet.

Re-designs the reference's per-action Python scans
(/root/reference/gobblet_rl/game/board.py:82-220) as fixed-shape vector
programs: the full 54-way legal mask is one fused XLA computation instead of
54 ``is_legal`` calls each rebuilding ``check_covered``/``get_flatboard``
(the O(54x9) hot loop flagged in SURVEY.md §3.1).

All functions operate on a single environment; batch with ``jax.vmap``.
Semantics replicated exactly, including the quirks:

* same-cell replacement is illegal (size must strictly increase,
  board.py:106-115);
* gobbling your own piece IS legal (covered-check ignores color,
  board.py:219);
* a covered piece cannot be moved (board.py:99-102);
* an illegal ``apply_action`` is a silent no-op (board.py:124-126);
* the winner scan lets the LAST matching win line decide
  (board.py:183-194).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gobblet_rl_tpu.core import types as T

# jnp copies of the static lookup tables
A_POS = jnp.asarray(T.ACTION_POS_NP)
A_PIECE = jnp.asarray(T.ACTION_PIECE_NP)
A_SIZE = jnp.asarray(T.ACTION_SIZE_NP)
A_LEVEL = jnp.asarray(T.ACTION_LEVEL_NP)
P_LEVEL = jnp.asarray(T.PIECE_LEVEL_NP)
WIN_LINES = jnp.asarray(T.WIN_LINES_NP)


def empty_board() -> jnp.ndarray:
    return jnp.zeros((T.NUM_LEVELS, T.NUM_CELLS), dtype=jnp.int8)


def player_sign(player: jnp.ndarray) -> jnp.ndarray:
    """+1 for agent 0, -1 for agent 1 (board.py:86)."""
    return jnp.where(player == 0, 1, -1).astype(jnp.int8)


def covered(board: jnp.ndarray) -> jnp.ndarray:
    """bool[3, 9]: positions holding a piece that is gobbled by a larger one.

    Vectorizes board.py:203-220 (color-blind, so self-gobbling locks the
    piece underneath; large pieces are never covered).
    """
    occ = board != 0
    c0 = occ[0] & (occ[1] | occ[2])
    c1 = occ[1] & occ[2]
    c2 = jnp.zeros_like(c1)
    return jnp.stack([c0, c1, c2])


def flatboard(board: jnp.ndarray) -> jnp.ndarray:
    """int8[9]: signed piece id of the topmost piece per cell (board.py:159-177).

    Piece ids grow strictly with level (1-2 < 3-4 < 5-6), so the level-argmax
    of |board| is the topmost occupied level; an empty stack yields 0.
    """
    abs_b = jnp.abs(board)
    top_level = jnp.argmax(abs_b, axis=0)  # ties (all empty) -> level 0 -> 0
    return board[top_level, jnp.arange(T.NUM_CELLS)]


def legal_mask(board: jnp.ndarray, player: jnp.ndarray) -> jnp.ndarray:
    """bool[54]: full legal-action mask in one shot.

    Replaces the reference's 54x ``is_legal`` scan (gobblet.py:223-228 +
    board.py:82-115) with per-piece/per-cell tensor ops.
    """
    sign = player_sign(player)
    own = (board * sign).astype(jnp.int8)  # own pieces positive

    # Locate each of our 6 pieces on its level.
    piece_ids = jnp.arange(1, T.NUM_PIECES + 1, dtype=jnp.int8)
    rows = own[P_LEVEL]                           # [6, 9]
    pres = rows == piece_ids[:, None]             # [6, 9]
    placed = pres.any(axis=1)                     # [6]
    loc = jnp.argmax(pres, axis=1)                # [6]

    cov = covered(board)
    piece_frozen = placed & cov[P_LEVEL, loc]     # [6] covered -> immovable

    flat = flatboard(board)
    top_size = (jnp.abs(flat).astype(jnp.int32) + 1) // 2  # [9], 0 if empty
    target_ok = (flat[A_POS] == 0) | (A_SIZE > top_size[A_POS])  # [54]

    return target_ok & ~piece_frozen[A_PIECE - 1]


def is_legal(board: jnp.ndarray, player: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    """Scalar legality of one action (board.py:82-115)."""
    action = jnp.asarray(action)
    pos = action % T.NUM_CELLS
    piece = action // T.NUM_CELLS + 1
    size = (piece + 1) // 2
    level = size - 1

    sign = player_sign(player)
    row = (board[level] * sign).astype(jnp.int8)
    pres = row == piece.astype(jnp.int8)
    placed = pres.any()
    loc = jnp.argmax(pres)
    frozen = placed & covered(board)[level, loc]

    flat = flatboard(board)
    top = flat[pos]
    target_ok = (top == 0) | (size > (jnp.abs(top).astype(jnp.int32) + 1) // 2)
    return target_ok & ~frozen


def apply_action(
    board: jnp.ndarray,
    player: jnp.ndarray,
    action: jnp.ndarray,
    legal: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Play a move; silent no-op when illegal (board.py:118-132).

    Pass ``legal`` when the caller already computed the mask to avoid
    re-deriving it.
    """
    action = jnp.asarray(action)
    if legal is None:
        legal = is_legal(board, player, action)
    pos = action % T.NUM_CELLS
    piece = action // T.NUM_CELLS + 1
    level = (piece + 1) // 2 - 1
    signed = (piece * player_sign(player)).astype(jnp.int8)
    lifted = jnp.where(board == signed, 0, board).astype(jnp.int8)
    played = lifted.at[level, pos].set(signed)
    return jnp.where(legal, played, board)


def line_winner(board: jnp.ndarray) -> jnp.ndarray:
    """int8: 0 no winner, +1 agent 0, -1 agent 1 (board.py:183-194).

    Faithful to the reference's scan-order overwrite: when (impossibly rare
    but reachable by uncovering) both players complete lines in one move, the
    LAST line in WIN_LINES order decides.
    """
    flat = flatboard(board)
    vals = flat[WIN_LINES]                               # [8, 3]
    lw = (vals > 0).all(axis=1).astype(jnp.int8) - (vals < 0).all(axis=1).astype(jnp.int8)
    nz = lw != 0
    last_idx = (T.WIN_LINES_NP.shape[0] - 1) - jnp.argmax(nz[::-1])
    return jnp.where(nz.any(), lw[last_idx], 0).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Debug invariants (SURVEY.md §5 "race detection" equivalent): the reference
# raises "PIECE HAS BEEN USED TWICE" (board.py:95).  Here the check is a pure
# predicate usable with jax.experimental.checkify or host asserts; it is kept
# out of the jitted hot path.
# ---------------------------------------------------------------------------
def board_invariants_ok(board: jnp.ndarray) -> jnp.ndarray:
    """True iff every signed piece id appears at most once on its level."""
    piece_ids = jnp.arange(1, T.NUM_PIECES + 1, dtype=jnp.int8)
    rows = board[P_LEVEL]                                  # [6, 9]
    pos_counts = (rows == piece_ids[:, None]).sum(axis=1)  # [6]
    neg_counts = (rows == -piece_ids[:, None]).sum(axis=1)
    on_level = ((jnp.abs(board) + 1) // 2 - 1) == jnp.arange(3)[:, None]
    level_ok = ((board == 0) | on_level).all()
    return (pos_counts <= 1).all() & (neg_counts <= 1).all() & level_ok


batched_legal_mask = jax.vmap(legal_mask)
batched_apply_action = jax.vmap(apply_action)
batched_line_winner = jax.vmap(line_winner)
batched_flatboard = jax.vmap(flatboard)
