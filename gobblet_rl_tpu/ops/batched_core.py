"""Lane-major (batch-last) batched Gobblet engine — the TPU fast path.

The naive batch-first layout (``int8[B, 3, 9]``) wastes the TPU: XLA maps the
trailing dim to the 128-wide vector lanes, so a 9-cell axis fills 9/128 lanes
and every gather/scatter (flatboard argmax, win-line lookup, piece placement)
lowers to serialized dynamic-slice ops.  This module transposes the world:

* every array is ``[small..., B]`` — the environment batch rides the lane
  dimension, tiny board axes ride sublanes;
* every rule is re-derived as closed-form ``where``-algebra with **zero
  dynamic gathers/scatters**:
  - flatboard = a 3-way select over levels (piece ids grow with level),
  - "is my piece covered" = ``any(presence & covered)`` (no argmax — a piece
    occurs at most once),
  - placement = one-hot masked select instead of ``.at[].set``,
  - the win scan = 8 static line checks folded in reference order
    (board.py:183-194 last-line-wins preserved);
* per-action tables index with *static* leading-axis gathers only.

Semantics are identical to :mod:`gobblet_rl_tpu.core.rules` (terminate-illegal
step, silent-freeze after done) — equivalence is asserted in
``tests/test_batched_core.py`` against the vmapped reference kernels.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gobblet_rl_tpu.core import types as T

# static per-action tables, shaped [54, 1] so they broadcast over lanes
A_POS = jnp.asarray(T.ACTION_POS_NP)
A_SIZE = jnp.asarray(T.ACTION_SIZE_NP)
A_PIECE = jnp.asarray(T.ACTION_PIECE_NP)
P_LEVEL = jnp.asarray(T.PIECE_LEVEL_NP)
_CH_PIECE = jnp.asarray(
    np.concatenate([np.arange(1, 7), -np.arange(1, 7)]).astype(np.int8)
)
_CH_LEVEL = jnp.asarray(np.concatenate([T.PIECE_LEVEL_NP, T.PIECE_LEVEL_NP]))
WIN_LINES = T.WIN_LINES_NP  # host ints for static unrolling


class PlanesState(NamedTuple):
    """Batched env state, batch-last."""

    board: jnp.ndarray        # int8[3, 9, B]
    current: jnp.ndarray      # int32[B]
    turn: jnp.ndarray         # int32[B]
    done: jnp.ndarray         # bool[B]
    winner: jnp.ndarray       # int8[B]
    last_action: jnp.ndarray  # int32[B]
    rewards: jnp.ndarray      # float32[2, B]


def reset_planes(batch: int) -> PlanesState:
    return PlanesState(
        board=jnp.zeros((3, 9, batch), jnp.int8),
        current=jnp.zeros(batch, jnp.int32),
        turn=jnp.zeros(batch, jnp.int32),
        done=jnp.zeros(batch, bool),
        winner=jnp.zeros(batch, jnp.int8),
        last_action=jnp.full(batch, -1, jnp.int32),
        rewards=jnp.zeros((2, batch), jnp.float32),
    )


def covered_planes(board: jnp.ndarray) -> jnp.ndarray:
    """bool[3, 9, B] — elementwise covered mask (board.py:203-220)."""
    occ = board != 0
    return jnp.stack([occ[0] & (occ[1] | occ[2]), occ[1] & occ[2],
                      jnp.zeros_like(occ[2])])


def flat_planes(board: jnp.ndarray) -> jnp.ndarray:
    """int8[9, B] — topmost signed piece per cell as a 3-way select
    (replaces the level-argmax + gather of the reference, board.py:159-177)."""
    occ1, occ2 = board[1] != 0, board[2] != 0
    return jnp.where(occ2, board[2], jnp.where(occ1, board[1], board[0]))


def player_sign_planes(current: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(current == 0, 1, -1).astype(jnp.int8)


def legal_mask_planes(board: jnp.ndarray, current: jnp.ndarray) -> jnp.ndarray:
    """bool[54, B] legal mask, fully elementwise (board.py:82-115)."""
    sign = player_sign_planes(current)                   # [B]
    own = board * sign                                   # [3,9,B]
    cov = covered_planes(board)

    rows = own[P_LEVEL]                                  # [6,9,B] static gather
    pres = rows == jnp.arange(1, 7, dtype=jnp.int8)[:, None, None]
    frozen = (pres & cov[P_LEVEL]).any(axis=1)           # [6,B]

    flat = flat_planes(board)                            # [9,B]
    top_size = ((jnp.abs(flat) + 1) >> 1).astype(jnp.int8)
    flat_pos = flat[A_POS]                               # [54,B] static gather
    size_pos = top_size[A_POS]
    target_ok = (flat_pos == 0) | (A_SIZE[:, None].astype(jnp.int8) > size_pos)
    return target_ok & ~frozen[A_PIECE - 1]


def winner_planes(flat: jnp.ndarray) -> jnp.ndarray:
    """int8[B] with the reference's last-line-wins fold (board.py:183-194)."""
    w = jnp.zeros(flat.shape[-1], jnp.int8)
    for c0, c1, c2 in WIN_LINES:
        pos = (flat[c0] > 0) & (flat[c1] > 0) & (flat[c2] > 0)
        neg = (flat[c0] < 0) & (flat[c1] < 0) & (flat[c2] < 0)
        lw = pos.astype(jnp.int8) - neg.astype(jnp.int8)
        w = jnp.where(lw != 0, lw, w)
    return w


def step_planes(state: PlanesState, actions: jnp.ndarray) -> PlanesState:
    """One batched ply, terminate-illegal semantics (gobblet.py:114 +
    board.py:118-132), finished games frozen."""
    board, current = state.board, state.current
    sign = player_sign_planes(current)

    pos = actions % 9                                    # [B]
    piece = actions // 9 + 1
    size = ((piece + 1) >> 1).astype(jnp.int8)
    level = (size - 1).astype(jnp.int32)
    signed = (piece.astype(jnp.int8) * sign)

    # scalar legality, elementwise: presence of the moving piece anywhere on
    # the board (ids are level-unique) & its covered status
    pres = board == signed[None, None]                   # [3,9,B]
    cov = covered_planes(board)
    frozen_mv = (pres & cov).any(axis=(0, 1))            # [B]

    flat = flat_planes(board)                            # [9,B]
    cell_oh = jnp.arange(9)[:, None] == pos[None]        # [9,B]
    flat_a = jnp.where(cell_oh, flat, 0).sum(axis=0, dtype=jnp.int32)
    top_sz = (jnp.abs(flat_a) + 1) >> 1
    legal = ((flat_a == 0) | (size.astype(jnp.int32) > top_sz)) & ~frozen_mv

    lvl_oh = jnp.arange(3)[:, None] == level[None]       # [3,B]
    place = lvl_oh[:, None, :] & cell_oh[None, :, :]     # [3,9,B]
    lifted = jnp.where(pres, jnp.int8(0), board)
    played = jnp.where(place, signed[None, None], lifted)
    new_board = jnp.where(legal[None, None], played, board)

    new_flat = flat_planes(new_board)
    winner = winner_planes(new_flat)
    won = winner != 0
    wf = winner.astype(jnp.float32)
    win_rewards = jnp.stack([wf, -wf])                   # [2,B]

    mover0 = (current == 0)
    ill_rewards = jnp.stack(
        [jnp.where(mover0, -1.0, 0.0), jnp.where(mover0, 0.0, -1.0)]
    )

    # compose: legal-step / illegal-termination / frozen
    live = ~state.done
    adv = live & legal
    board_out = jnp.where(adv[None, None], new_board, board)
    current_out = jnp.where(adv, 1 - current, current)
    turn_out = jnp.where(adv, state.turn + 1, state.turn)
    done_out = state.done | (live & (~legal | won))
    winner_out = jnp.where(adv, winner, jnp.where(live, jnp.int8(0), state.winner))
    rewards_out = jnp.where(
        adv[None], win_rewards, jnp.where(live[None], ill_rewards * (~legal)[None], 0.0)
    )
    last_out = jnp.where(live, actions.astype(jnp.int32), state.last_action)
    return PlanesState(
        board=board_out,
        current=current_out,
        turn=turn_out,
        done=done_out,
        winner=winner_out,
        last_action=last_out,
        rewards=rewards_out,
    )


def autoreset_planes(state: PlanesState) -> PlanesState:
    """Restart finished games in-kernel (keep emitted rewards/winner in the
    caller's TimeStep, not here)."""
    d = state.done
    return PlanesState(
        board=jnp.where(d[None, None], jnp.int8(0), state.board),
        current=jnp.where(d, 0, state.current),
        turn=jnp.where(d, 0, state.turn),
        done=jnp.zeros_like(d),
        winner=jnp.where(d, jnp.int8(0), state.winner),
        last_action=jnp.where(d, -1, state.last_action),
        rewards=state.rewards,
    )


def observe_planes_lm(board: jnp.ndarray, agent: jnp.ndarray) -> jnp.ndarray:
    """int8[13, 9, B] observation planes, lane-major (gobblet.py:179-208).

    Flattened index order is (channel, cell) — a fixed permutation of the
    reference's (row, col, channel); use :func:`to_reference_obs` at API
    boundaries that need the exact reference tensor layout.
    """
    sign = jnp.where(agent == 0, 1, -1).astype(jnp.int8)
    own = board * sign
    rows = own[_CH_LEVEL]                                 # [12,9,B]
    planes = (rows == _CH_PIECE[:, None, None]).astype(jnp.int8)
    agent_plane = jnp.broadcast_to(
        agent.astype(jnp.int8)[None, None], (1, 9, planes.shape[-1])
    )
    return jnp.concatenate([planes, agent_plane], axis=0)


def to_reference_obs(planes: jnp.ndarray) -> jnp.ndarray:
    """[13, 9, B] lane-major planes -> [B, 3, 3, 13] reference layout."""
    b = planes.shape[-1]
    return jnp.transpose(planes, (2, 1, 0)).reshape(b, 3, 3, 13)


def features_lm(board: jnp.ndarray, agent: jnp.ndarray) -> jnp.ndarray:
    """float-ready int8[117, B] flattened observation for lane-major nets."""
    return observe_planes_lm(board, agent).reshape(117, -1)


def sample_random_lm(key: jax.Array, mask: jnp.ndarray) -> jnp.ndarray:
    """int32[B] uniform-over-mask via Gumbel argmax over the sublane axis.

    Measured alternatives on TPU v5e (B=512k fused rollout, round 2) both
    lose: a 1-draw-per-env cumsum-threshold sampler is 1.8x slower (the
    int8 sublane cumsum costs far more than the [54, B] random field —
    threefry fuses well), and a plain uniform-field argmax (same
    distribution, no logs) is ~3% slower and noisier; the Gumbel field is
    the stable configuration.  The PRNG impl is the caller's choice via the
    key: ``jax.random.key(seed, impl="rbg")`` makes the random field ~18%
    cheaper end-to-end than default threefry (222.8M vs 186.5M steps/s,
    v5e, B=512k) with identical episode statistics — bench.py uses it;
    training keeps threefry for cross-backend seed reproducibility.  Under
    rbg the sampler ranking was re-measured and holds: gumbel 222.8M >
    uniform-field 218.9M > raw-bits argmax 207.5M at B=512k (at B=1M all
    three converge near 210M — the extra batch only adds HBM residency)."""
    g = jax.random.gumbel(key, mask.shape, dtype=jnp.float32)
    return jnp.argmax(jnp.where(mask, g, -jnp.inf), axis=0).astype(jnp.int32)


def apply_action_unchecked(board: jnp.ndarray, current: jnp.ndarray,
                           actions: jnp.ndarray) -> jnp.ndarray:
    """Placement only — caller guarantees ``actions`` are legal (e.g. sampled
    from the mask) and the games are live; skips the covered/flat legality
    re-derivation of :func:`step_planes` (~30% of the rollout hot loop)."""
    sign = player_sign_planes(current)
    piece = actions // 9 + 1
    level = ((piece + 1) >> 1) - 1
    signed = piece.astype(jnp.int8) * sign

    pres = board == signed[None, None]
    cell_oh = jnp.arange(9)[:, None] == (actions % 9)[None]
    lvl_oh = jnp.arange(3)[:, None] == level[None]
    place = lvl_oh[:, None, :] & cell_oh[None, :, :]
    lifted = jnp.where(pres, jnp.int8(0), board)
    return jnp.where(place, signed[None, None], lifted)


def step_trusted(state: PlanesState, actions: jnp.ndarray) -> PlanesState:
    """:func:`step_planes` minus the legality re-derivation, for callers
    whose actions are legal BY CONSTRUCTION (sampled/argmaxed from
    ``legal_mask_planes``, or emitted by the tree searches — every policy
    in the training collects).  A live Gobblet position always has a legal
    move (the two size-3 pieces can never be gobbled, so they are always
    playable or movable), so mask-derived actions are always legal and the
    outcome is BIT-IDENTICAL to ``step_planes``
    (tests/test_batched.py::test_step_trusted_matches_step_planes).

    Motivation (round-5 device profile, docs/PROFILE.md): the per-ply
    covered/frozen/top-size legality reductions were ~15% of the fused DQN
    iteration's device time, paid twice per learner transition on actions
    that were just drawn from the very mask being re-derived."""
    live = ~state.done
    new_board = apply_action_unchecked(state.board, state.current, actions)
    winner = winner_planes(flat_planes(new_board))
    wf = winner.astype(jnp.float32)
    return PlanesState(
        board=jnp.where(live[None, None], new_board, state.board),
        current=jnp.where(live, 1 - state.current, state.current),
        turn=jnp.where(live, state.turn + 1, state.turn),
        done=state.done | (live & (winner != 0)),
        winner=jnp.where(live, winner, state.winner),
        last_action=jnp.where(live, actions.astype(jnp.int32), state.last_action),
        rewards=jnp.where(live[None], jnp.stack([wf, -wf]), 0.0),
    )


# ---------------------------------------------------------------------------
# Fused rollout
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnums=(2,))
def rollout_random(state: PlanesState, key: jax.Array, num_steps: int):
    """Random-admissible self-play rollout, fully fused; returns aggregate
    episode/win statistics (the bench hot loop).

    Uses the unchecked fast path: every state entering a ply is live
    (auto-reset runs inside the loop) and every action is drawn from the
    legal mask, so legality re-validation and done-freezing are skipped.
    """

    def body(carry, _):
        state, key = carry
        key, sub = jax.random.split(key)
        mask = legal_mask_planes(state.board, state.current)
        actions = sample_random_lm(sub, mask)
        board = apply_action_unchecked(state.board, state.current, actions)
        winner = winner_planes(flat_planes(board))
        done = winner != 0
        out = (
            done.sum(dtype=jnp.int32),
            (winner == 1).sum(dtype=jnp.int32),
            (winner == -1).sum(dtype=jnp.int32),
        )
        new_state = PlanesState(
            board=jnp.where(done[None, None], jnp.int8(0), board),
            current=jnp.where(done, 0, 1 - state.current),
            turn=jnp.where(done, 0, state.turn + 1),
            done=state.done,  # always False on this path
            winner=state.winner,
            last_action=actions.astype(jnp.int32),
            rewards=state.rewards,
        )
        return (new_state, key), out

    (state, key), (eps, w1, w2) = jax.lax.scan(body, (state, key), None, length=num_steps)
    return state, key, {
        "episodes": eps.sum(),
        "wins_p1": w1.sum(),
        "wins_p2": w2.sum(),
    }
