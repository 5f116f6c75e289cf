"""Functional single-environment transition kernels.

Two step semantics are provided, matching the reference's wrapper layering
(SURVEY.md §3.1):

* :func:`step_raw` — ``raw_env.step`` semantics
  (/root/reference/gobblet_rl/game/gobblet.py:231-273): an illegal action is a
  silent board no-op but the turn still passes to the other agent;
* :func:`step_strict` — the behavior of the wrapped ``env()`` under
  ``TerminateIllegalWrapper(illegal_reward=-1)`` (gobblet.py:114): an illegal
  action terminates the game with reward -1 for the mover and 0 for the
  opponent, leaving the board untouched.  This is the semantics batched
  training uses (there is no wrapper stack on device).

Batch with ``jax.vmap``; all outputs are fixed-shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gobblet_rl_tpu.core import rules
from gobblet_rl_tpu.core.types import GobbletState


def reset() -> GobbletState:
    """Fresh device-side start state (gobblet.py:275-290)."""
    return GobbletState(
        board=rules.empty_board(),
        current=jnp.int32(0),
        turn=jnp.int32(0),
        done=jnp.bool_(False),
        winner=jnp.int8(0),
        last_action=jnp.int32(-1),
        rewards=jnp.zeros(2, dtype=jnp.float32),
    )


def _advance(state: GobbletState, action: jnp.ndarray, legal: jnp.ndarray) -> GobbletState:
    board = rules.apply_action(state.board, state.current, action, legal=legal)
    winner = rules.line_winner(board)
    done = winner != 0
    w = winner.astype(jnp.float32)
    # winner==+1: agent0 +1 / agent1 -1; winner==-1: mirrored (gobblet.py:248-263)
    rewards = jnp.stack([w, -w])
    return GobbletState(
        board=board,
        current=1 - state.current,
        turn=state.turn + 1,
        done=done,
        winner=winner,
        last_action=jnp.asarray(action, jnp.int32),
        rewards=rewards,
    )


def _frozen(state: GobbletState) -> GobbletState:
    """Post-terminal no-op: state unchanged, zero rewards emitted."""
    return state._replace(rewards=jnp.zeros(2, dtype=jnp.float32))


def _select(pred: jnp.ndarray, a: GobbletState, b: GobbletState) -> GobbletState:
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def step_raw(state: GobbletState, action: jnp.ndarray) -> GobbletState:
    """raw_env.step semantics; stepping a finished game is a frozen no-op."""
    action = jnp.asarray(action)
    legal = rules.is_legal(state.board, state.current, action)
    return _select(state.done, _frozen(state), _advance(state, action, legal))


def step_strict(state: GobbletState, action: jnp.ndarray) -> GobbletState:
    """Terminate-illegal semantics used by batched training (gobblet.py:114)."""
    action = jnp.asarray(action)
    legal = rules.is_legal(state.board, state.current, action)
    stepped = _advance(state, action, legal)
    mover_onehot = (jnp.arange(2) == state.current).astype(jnp.float32)
    illegal_term = state._replace(
        done=jnp.bool_(True),
        rewards=-mover_onehot,
        last_action=jnp.asarray(action, jnp.int32),
    )
    live = _select(legal, stepped, illegal_term)
    return _select(state.done, _frozen(state), live)


batched_reset = jax.vmap(lambda _: reset())
batched_step_raw = jax.vmap(step_raw)
batched_step_strict = jax.vmap(step_strict)
