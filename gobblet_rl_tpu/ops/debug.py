"""Debug-mode invariant checking (SURVEY §5 "race detection" equivalent).

The reference's only runtime invariant is a hard
``raise Exception("PIECE HAS BEEN USED TWICE")`` inside ``is_legal``
(board.py:95).  The batched engines keep the hot path assert-free; this
module provides the checks as pure predicates plus a ``checkify``-able
wrapper so training can run a guarded step when debugging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from gobblet_rl_tpu.ops import batched_core as bc


def planes_invariants(board: jnp.ndarray) -> jnp.ndarray:
    """bool[B]: per-env structural validity of an int8[3, 9, B] board.

    * each signed piece id appears at most once, and only on its level;
    * no values outside [-6, 6].
    """
    ok = jnp.ones(board.shape[-1], bool)
    for level in range(3):
        allowed = (2 * level + 1, 2 * level + 2)
        row = board[level]                     # [9, B]
        abs_row = jnp.abs(row)
        level_ok = ((row == 0)
                    | (abs_row == allowed[0])
                    | (abs_row == allowed[1])).all(axis=0)
        ok = ok & level_ok
        for piece in allowed:
            for sign in (1, -1):
                count = (row == sign * piece).sum(axis=0)
                ok = ok & (count <= 1)
    return ok


def state_invariants(state: bc.PlanesState) -> jnp.ndarray:
    """bool[B]: board validity + field-range checks."""
    ok = planes_invariants(state.board)
    ok = ok & ((state.current == 0) | (state.current == 1))
    ok = ok & (jnp.abs(state.winner.astype(jnp.int32)) <= 1)
    return ok


def checked_step(state: bc.PlanesState, actions: jnp.ndarray):
    """step_planes with checkify assertions on the pre- and post-state.

    Usage::

        err, new_state = jax.jit(checkify.checkify(debug.checked_step))(s, a)
        err.throw()  # host-side, raises on violated invariants
    """
    checkify.check(state_invariants(state).all(), "pre-step state invalid")
    checkify.check(
        ((actions >= 0) & (actions < 54)).all(), "action out of range"
    )
    new_state = bc.step_planes(state, actions)
    checkify.check(state_invariants(new_state).all(), "post-step state invalid")
    return new_state
