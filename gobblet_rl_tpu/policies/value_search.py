"""Learned-eval shallow search: a batched depth-1/2(+leaf-solver) minimax
over the lane-major engine with a trained value function at the leaves.

This upgrades the reference's strongest scripted idea — the depth-3 greedy
forced-win scan (/root/reference/gobblet_rl/game/greedy_policy.py:158-208)
— with a LEARNED evaluation: instead of treating all non-terminal leaves
as equal, every depth-2 leaf is scored by a value network (a DQN max-Q
head or an AlphaZero value head), and the exact 1-ply solver certifies
leaf wins so three-ply forced wins are found exactly, like the
reference's scan, while everything else is ranked by learned strength.

Motivation (round-4 exploitability audit, docs/RESULTS.md): the raw DQN /
PPO policies convert 0/32 provably-won openings against perfect defense —
they know good positions but cannot steer a won middlegame into a mate.
One ply of search on top of the same value head restores conversion
without any retraining.

TPU shape: the whole (54 candidates x 54 replies) tree slice for every
env in the batch is three folds of the lane axis — candidates fold to
``54*B`` lanes, replies to ``54*54*B``, and the optional leaf solver to
``54^3*B`` pure int8 engine lanes (no net evals) — so one move costs two
batched net applies and a handful of elementwise passes, all MXU/VPU
friendly, no per-env Python.

Scores are on a fixed scale so proven results dominate estimates:
+4 immediate win, +2 proven win-in-3 (all replies leave us a 1-ply win),
[-1, 1] learned leaf value, -2 opponent has a winning reply, -4 the
candidate loses on the spot (uncovers an opponent line).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gobblet_rl_tpu.ops import batched_core as bc

A = 54  # action-space size


def _fold_actions(board: jnp.ndarray, current: jnp.ndarray):
    """Apply ALL 54 actions to every lane by folding the action axis into
    the lane axis: board int8[3,9,B], current int32[B] ->
    (boards int8[3,9,54*B] with lane a*B+b = action a on env b, illegal
    actions applied unchecked — callers must mask by legality)."""
    B = current.shape[0]
    boards_t = jnp.broadcast_to(
        board[:, :, None, :], (3, 9, A, B)
    ).reshape(3, 9, A * B)
    cur_t = jnp.broadcast_to(current[None], (A, B)).reshape(A * B)
    act_t = jnp.broadcast_to(
        jnp.arange(A, dtype=jnp.int32)[:, None], (A, B)
    ).reshape(A * B)
    return bc.apply_action_unchecked(boards_t, cur_t, act_t)


def _can_win_now(board: jnp.ndarray, current: jnp.ndarray) -> jnp.ndarray:
    """bool[B]: the mover has a legal immediate win (exact 1-ply solve,
    pure engine lanes — no net evals)."""
    B = current.shape[0]
    mask = bc.legal_mask_planes(board, current)                  # [54,B]
    stepped = _fold_actions(board, current)                      # [3,9,54B]
    w = bc.winner_planes(bc.flat_planes(stepped)).reshape(A, B)
    sign = bc.player_sign_planes(current)
    return (mask & (w == sign[None])).any(axis=0)


def make_value_search(value_fn, depth: int = 2, solve_leaves: bool = True,
                      tie_noise: float = 1e-5):
    """Build a tournament-compatible ``(key, board_lm[3,9,B], current[B])
    -> actions int32[B]`` policy (eval/tournament.py PolicyFn contract).

    ``value_fn(board_lm[3,9,N], current[N]) -> f32[N]`` scores a position
    from the MOVER's perspective in roughly [-1, 1] (clipped here); see
    :func:`dqn_value_fn` / :func:`az_value_fn`.

    ``depth=1``: pick argmax of -value(opponent node) after our move.
    ``depth=2``: full candidate x reply minimax with the learned eval at
    the 2-ply leaves; ``solve_leaves`` additionally certifies leaves where
    we have an immediate win (making 3-ply forced wins exact — the
    reference depth-3 scan's job, greedy_policy.py:158-208).
    """
    assert depth in (1, 2), depth

    @jax.jit
    def policy(key, board, current):
        B = current.shape[0]
        sign = bc.player_sign_planes(current)                    # int8[B]
        mask1 = bc.legal_mask_planes(board, current)             # [54,B]
        boards1 = _fold_actions(board, current)                  # [3,9,54B]
        w1 = bc.winner_planes(bc.flat_planes(boards1)).reshape(A, B)
        i_win = mask1 & (w1 == sign[None])
        i_loss = mask1 & (w1 == -sign[None])    # uncovered an opponent line

        us_f = jnp.broadcast_to(current[None], (A, B)).reshape(A * B)
        sign_f = jnp.broadcast_to(sign[None], (A, B)).reshape(A * B)
        if depth == 1:
            v_opp = value_fn(boards1, 1 - us_f)                  # [54B]
            score = -jnp.clip(v_opp, -1.0, 1.0).reshape(A, B)
        else:
            # every opponent reply on every candidate board: reply-major
            # rows over candidate-folded lanes
            mask2 = bc.legal_mask_planes(boards1, 1 - us_f)      # [54,54B]
            boards2 = _fold_actions(boards1, 1 - us_f)           # [3,9,54*54B]
            w2 = bc.winner_planes(bc.flat_planes(boards2)).reshape(A, A * B)
            opp_wins = mask2 & (w2 == -sign_f[None])

            us2 = jnp.broadcast_to(us_f[None], (A, A * B)).reshape(A * A * B)
            leaf_v = jnp.clip(value_fn(boards2, us2), -1.0, 1.0)
            leaf_v = leaf_v.reshape(A, A * B)
            if solve_leaves:
                can_win = _can_win_now(boards2, us2).reshape(A, A * B)
                leaf_v = jnp.where(can_win, 2.0, leaf_v)

            reply_sc = jnp.where(opp_wins, -2.0, leaf_v)
            reply_sc = jnp.where(mask2, reply_sc, jnp.inf)
            cand = reply_sc.min(axis=0)                          # [54B]
            # no legal reply cannot happen on a live board, but keep the
            # score finite so argmax stays well-defined under jit
            score = jnp.clip(cand, -4.0, 3.0).reshape(A, B)

        score = jnp.where(i_win, 4.0, score)
        score = jnp.where(i_loss, -4.0, score)
        # tiny Gumbel tie-break: equally-scored moves (e.g. several proven
        # wins) vary by key, like the reference's random fallback draw
        g = tie_noise * jax.random.gumbel(key, (A, B), jnp.float32)
        score = jnp.where(mask1, score + g, -jnp.inf)
        return jnp.argmax(score, axis=0).astype(jnp.int32)

    return policy


def dqn_value_fn(net, params):
    """Position value = max legal Q — the DQN head as a leaf evaluator.
    Observations are mover-perspective (own pieces positive), so the same
    head scores both seats."""

    def value(board, current):
        obs = bc.features_lm(board, current).T
        q = net.apply(params, obs)
        mask = bc.legal_mask_planes(board, current).T
        return jnp.max(jnp.where(mask, q, -jnp.inf), axis=-1)

    return value


def zoo_search_policy(name: str, depth: int = 2, solve_leaves: bool = True):
    """Depth-``depth`` learned-eval search over a committed zoo entry's
    value head (dqn -> max-Q, alphazero/ppo -> critic), as a tournament
    PolicyFn.  The ``<name>+search2`` entrants in example_tournament /
    scripts/exploitability.py are built here."""
    from gobblet_rl_tpu import zoo

    net, params, entry = zoo.load(name)
    vf = (dqn_value_fn(net, params) if entry["family"] == "dqn"
          else az_value_fn(net, params))
    return make_value_search(vf, depth=depth, solve_leaves=solve_leaves)


def az_value_fn(net, params):
    """The AlphaZero value head (tanh-bounded, mover-perspective) as a leaf
    evaluator — search without the MCTS."""

    def value(board, current):
        obs = bc.features_lm(board, current).T
        _, v = net.apply(params, obs)
        return jnp.tanh(v)

    return value
