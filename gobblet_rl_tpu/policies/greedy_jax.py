"""Batched, jittable depth-1/2 greedy lookahead (lane-major).

On-device tensorized re-expression of the reference greedy search
(/root/reference/gobblet_rl/game/greedy_policy.py:84-157): all 54 candidate
boards are evaluated at once, and opponent replies are scanned as 54 more
vectorized steps — a (54 x 54) game-tree slice as one XLA program per ply,
for every environment in the batch simultaneously.

Decision rule (semantic equivalent of the reference's depth-2 priorities;
the reference's incidental iteration-order quirks and mutable prune lists
don't batch, so this variant is priority-exact rather than order-exact —
the move-for-move-parity host implementation lives in
:mod:`gobblet_rl_tpu.policies.greedy`):

1. an immediately winning move, if any (lowest action index, like the
   reference's ascending scan + break, greedy_policy.py:84-94);
2. otherwise a "safe blocking" move — one after which the opponent has no
   winning reply — sampled uniformly among them (greedy_policy.py:152-157);
3. otherwise a random legal move that doesn't lose immediately, if any
   (prune logic, greedy_policy.py:96-101 / 129-136);
4. otherwise a random legal move.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gobblet_rl_tpu.ops import batched_core as bc


def _apply_all_actions(board: jnp.ndarray, current: jnp.ndarray) -> jnp.ndarray:
    """int8[54, 3, 9, B]: every action applied to every board (illegal ->
    unchanged board; callers must mask)."""

    def apply_one(action):
        actions = jnp.full(board.shape[-1], action, jnp.int32)
        state = bc.PlanesState(
            board=board,
            current=current,
            turn=jnp.zeros_like(current),
            done=jnp.zeros(board.shape[-1], bool),
            winner=jnp.zeros(board.shape[-1], jnp.int8),
            last_action=actions,
            rewards=jnp.zeros((2, board.shape[-1]), jnp.float32),
        )
        return bc.step_planes(state, actions).board

    return jax.vmap(apply_one)(jnp.arange(54))


def _winner_all(boards: jnp.ndarray) -> jnp.ndarray:
    """int8[54, B] winner for each candidate board."""
    return jax.vmap(lambda b: bc.winner_planes(bc.flat_planes(b)))(boards)


@partial(jax.jit, static_argnums=(3,))
def greedy_actions(
    key: jax.Array,
    board: jnp.ndarray,      # int8[3, 9, B]
    current: jnp.ndarray,    # int32[B]
    depth: int = 2,
) -> jnp.ndarray:
    """int32[B] greedy moves for the player to move in each env."""
    B = board.shape[-1]
    sign = bc.player_sign_planes(current)            # my winner value, [B]
    mask = bc.legal_mask_planes(board, current)      # [54,B]

    boards1 = _apply_all_actions(board, current)     # [54,3,9,B]
    w1 = _winner_all(boards1)                        # [54,B]

    i_win = mask & (w1 == sign[None])                # immediate wins
    i_lose = mask & (w1 == -sign[None])              # immediate losses (uncover)

    if depth >= 2:
        opp = 1 - current

        def reply_body(r, opp_can_win):
            replies = jnp.full(B, r, jnp.int32)

            # apply reply r to all 54 candidate boards at once
            def apply_reply(cand_board):
                state = bc.PlanesState(
                    board=cand_board,
                    current=opp,
                    turn=jnp.zeros_like(opp),
                    done=jnp.zeros(B, bool),
                    winner=jnp.zeros(B, jnp.int8),
                    last_action=replies,
                    rewards=jnp.zeros((2, B), jnp.float32),
                )
                new = bc.step_planes(state, replies)
                return new.winner

            w2 = jax.vmap(apply_reply)(boards1)       # [54,B]
            return opp_can_win | (w2 == -sign[None])

        opp_can_win = jax.lax.fori_loop(
            0, 54, reply_body, jnp.zeros((54, B), bool)
        )
        neutral = mask & (w1 == 0)
        safe = neutral & ~opp_can_win                 # blocking/safe moves
    else:
        safe = jnp.zeros((54, B), bool)

    not_losing = mask & ~i_lose

    g = jax.random.gumbel(key, (54, B))
    def pick(m, fallback):
        score = jnp.where(m, g, -jnp.inf)
        return jnp.where(m.any(axis=0), jnp.argmax(score, axis=0), fallback)

    # priority 4 -> 1 (later overwrites)
    action = pick(mask, jnp.zeros(B, jnp.int32))
    action = pick(not_losing, action)
    if depth >= 2:
        action = pick(safe, action)
    # immediate win: lowest index, mirroring the reference's ascending break
    win_idx = jnp.argmax(i_win, axis=0)
    action = jnp.where(i_win.any(axis=0), win_idx, action)
    return action.astype(jnp.int32)
