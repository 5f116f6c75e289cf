"""Lane-major (batch-last) Gumbel MCTS — the whole tree as one program.

Same algorithm as :mod:`gobblet_rl_tpu.search.gumbel` (sequential halving
at the root, improved-policy interior selection, mixed-value estimator,
exact 1-ply certification — Danihelka et al., ICLR 2022), re-laid-out the
way the rest of this framework lays out everything: the environment batch
rides the trailing lane axis of every tree array (``N/W/P: f32[M, 54, B]``,
``boards: int8[M, 3, 9, B]``), and every per-lane tree operation —
child-pointer chase, row gather, visit/value backup — is closed-form
one-hot select/accumulate algebra over the whole array instead of a
``vmap``-batched scatter/gather with per-lane indices.

Why: the vmapped search (batch-FIRST tree arrays) degrades past ~1k lanes
(measured round 4, docs/RESULTS.md sweep: 41.1k moves/s at 1,024 envs but
18.5k at 4,096) because each simulation step lowers to serialized
scatters over ``[B, M, 54]`` with lane-varying indices.  Here the same
step is a handful of dense elementwise passes over ``[M, 54, B]``
(M = num_sims+1 = 33 for the shipped config), which the VPU streams at
HBM rate regardless of B.  Equivalence with the vmapped search is pinned
by tests/test_gumbel_lm.py (bit-identical trees under zeroed Gumbel
noise, tactical certification, head-to-head strength).

The reference has no search at all beyond the depth-3 greedy scan
(/root/reference/gobblet_rl/game/greedy_policy.py:158-208).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.search.gumbel import (
    GumbelConfig,
    _considered_counts,
    _phase_table,
)

A = 54  # action-space size


# ---------------------------------------------------------------------------
# one-hot select/accumulate primitives (lane axis LAST everywhere)
# ---------------------------------------------------------------------------
def _oh_m(node: jnp.ndarray, M: int) -> jnp.ndarray:
    """bool[M, B] one-hot over the node axis (node may be clamped)."""
    return jnp.arange(M, dtype=jnp.int32)[:, None] == node[None]


def _oh_a(action: jnp.ndarray) -> jnp.ndarray:
    """bool[54, B] one-hot over the action axis."""
    return jnp.arange(A, dtype=jnp.int32)[:, None] == action[None]


def _row(X: jnp.ndarray, ohm: jnp.ndarray) -> jnp.ndarray:
    """Per-lane row gather: X[M, 54, B], ohm[M, B] -> [54, B]."""
    return jnp.where(ohm[:, None, :], X, 0).sum(0)


def _row_bool(X: jnp.ndarray, ohm: jnp.ndarray) -> jnp.ndarray:
    return (ohm[:, None, :] & X).any(0)


def _scal(X: jnp.ndarray, ohm: jnp.ndarray) -> jnp.ndarray:
    """Per-lane scalar gather: X[M, B], ohm[M, B] -> [B]."""
    return jnp.where(ohm, X, 0).sum(0)


def _scal_bool(X: jnp.ndarray, ohm: jnp.ndarray) -> jnp.ndarray:
    return (ohm & X).any(0)


def _board_at(boards: jnp.ndarray, ohm: jnp.ndarray) -> jnp.ndarray:
    """boards int8[M, 3, 9, B], ohm[M, B] -> int8[3, 9, B]."""
    return (
        jnp.where(ohm[:, None, None, :], boards, jnp.int8(0))
        .sum(0)
        .astype(jnp.int8)
    )


def _top_k_mask_lm(score: jnp.ndarray, k) -> jnp.ndarray:
    """bool[54, B]: per lane, entries with rank < k (tie-inclusive) — the
    lane-major twin of gumbel._top_k_mask."""
    rank = (score[None, :, :] > score[:, None, :]).sum(1)
    return rank < k


def _sigma(q, max_n, config: GumbelConfig):
    return (config.c_visit + max_n) * config.c_scale * q


def _mixed_value_lm(v_hat, q, n, priors, legal):
    """Per-lane mixed-value estimator over [54, B] rows -> [B]."""
    visited = (n > 0) & legal
    pi = jnp.where(legal, priors, 0.0)
    pi = pi / jnp.maximum(pi.sum(0), 1e-12)
    w_vis = jnp.where(visited, pi, 0.0).sum(0)
    q_avg = jnp.where(visited, pi * q, 0.0).sum(0) / jnp.maximum(w_vis, 1e-12)
    sum_n = n.sum(0)
    v_mix = (v_hat + sum_n * q_avg) / (1.0 + sum_n)
    return jnp.where(w_vis > 0, v_mix, v_hat)


# ---------------------------------------------------------------------------
# batched rules ops on the lane-major engine
# ---------------------------------------------------------------------------
def _evaluate_lm(net_apply, params, board, player):
    """(priors[54,B], value[B], mask[54,B]) for boards int8[3,9,B]."""
    obs = bc.features_lm(board, player).T
    logits, value = net_apply(params, obs)
    mask = bc.legal_mask_planes(board, player)
    masked = jnp.where(mask, logits.T, -1e9)
    priors = jax.nn.softmax(masked, axis=0)
    return priors, jnp.tanh(value), mask


def _winning_actions_lm(board, player):
    """bool[54, B]: legal immediate wins per lane (actions ride a folded
    54×B lane axis of one engine call)."""
    B = player.shape[0]
    mask = bc.legal_mask_planes(board, player)
    boards_t = jnp.broadcast_to(board[:, :, None, :], (3, 9, A, B)).reshape(3, 9, A * B)
    players_t = jnp.broadcast_to(player[None], (A, B)).reshape(A * B)
    actions_t = jnp.broadcast_to(
        jnp.arange(A, dtype=jnp.int32)[:, None], (A, B)
    ).reshape(A * B)
    stepped = bc.apply_action_unchecked(boards_t, players_t, actions_t)
    win = bc.winner_planes(bc.flat_planes(stepped)).reshape(A, B)
    sign = jnp.where(player == 0, 1, -1).astype(win.dtype)
    return mask & (win == sign[None])


def _apply_and_winner_lm(board, player, action):
    """(next boards int8[3,9,B], winner int8[B]) — actions must be legal."""
    stepped = bc.apply_action_unchecked(board, player, action)
    return stepped, bc.winner_planes(bc.flat_planes(stepped))


# ---------------------------------------------------------------------------
# the search
# ---------------------------------------------------------------------------
def gumbel_search_lm(net_apply, params, board_lm, players, key,
                     config: GumbelConfig, noise=None):
    """Batched search over lane-major roots.

    board_lm int8[3, 9, B], players int32[B] ->
    (actions int32[B], pi f32[B, 54], q f32[B, 54], visits f32[B, 54],
    root_value f32[B]) — the same contract as gumbel.gumbel_search.

    ``noise`` (f32[54, B], optional) substitutes a pre-drawn root Gumbel
    field for the internal single [54,B] draw, enabling the with-noise
    bit-equivalence test against the vmapped search (whose internal
    discipline — one split key per lane — draws different values for the
    same top-level key).
    """
    B = players.shape[0]
    M = config.num_sims + 1
    phase_np = _phase_table(config.num_sims, config.max_considered)
    counts_np = _considered_counts(config.max_considered, int(phase_np[-1]) + 1)
    phase_tab = jnp.asarray(phase_np)
    counts_tab = jnp.asarray(counts_np)

    boards = jnp.zeros((M, 3, 9, B), jnp.int8).at[0].set(board_lm)
    players_t = jnp.zeros((M, B), jnp.int32).at[0].set(players)
    terminal = jnp.zeros((M, B), bool)
    node_value = jnp.zeros((M, B), jnp.float32)
    P = jnp.zeros((M, A, B), jnp.float32)
    V = jnp.zeros((M, B), jnp.float32)
    N = jnp.zeros((M, A, B), jnp.float32)
    W = jnp.zeros((M, A, B), jnp.float32)
    legal = jnp.zeros((M, A, B), bool)
    children = jnp.full((M, A, B), -1, jnp.int32)
    parent = jnp.full((M, B), -1, jnp.int32)
    pa = jnp.full((M, B), -1, jnp.int32)

    priors0, value0, mask0 = _evaluate_lm(net_apply, params, board_lm, players)
    P = P.at[0].set(priors0)
    V = V.at[0].set(value0)
    legal = legal.at[0].set(mask0)

    g = noise if noise is not None else jax.random.gumbel(key, (A, B), jnp.float32)
    logp0 = jnp.where(mask0, jnp.log(jnp.maximum(priors0, 1e-12)), -jnp.inf)
    base_score = jnp.where(mask0, g + logp0, -jnp.inf)
    considered0 = mask0 & _top_k_mask_lm(base_score, counts_np[0])

    def root_score(N_, W_):
        n0, w0 = N_[0], W_[0]
        q0 = jnp.where(n0 > 0, w0 / jnp.maximum(n0, 1.0), 0.0)
        return jnp.where(
            mask0, g + logp0 + _sigma(q0, n0.max(0), config), -jnp.inf
        )

    def interior_action(N_, W_, P_, V_, legal_, node):
        ohm = _oh_m(node, M)
        n = _row(N_, ohm)
        w = _row(W_, ohm)
        leg = _row_bool(legal_, ohm)
        p = _row(P_, ohm)
        v_hat = _scal(V_, ohm)
        q = jnp.where(n > 0, w / jnp.maximum(n, 1.0), 0.0)
        logp = jnp.where(leg, jnp.log(jnp.maximum(p, 1e-12)), -jnp.inf)
        v_mix = _mixed_value_lm(v_hat, q, n, p, leg)
        completed = jnp.where(n > 0, q, v_mix[None])
        imp = jnp.where(
            leg, logp + _sigma(completed, n.max(0), config), -jnp.inf
        )
        pi = jax.nn.softmax(imp, axis=0)
        score = jnp.where(leg, pi - n / (1.0 + n.sum(0)), -jnp.inf)
        return jnp.argmax(score, axis=0).astype(jnp.int32)

    def simulate(sim, carry):
        (boards, players_t, terminal, node_value, P, V, N, W, legal,
         children, parent, pa, considered) = carry

        # ---- phase transition: halve the considered set by current score
        phase = phase_tab[sim]
        is_new_phase = jnp.where(sim == 0, False, phase != phase_tab[sim - 1])
        k = counts_tab[phase]
        sc = root_score(N, W)
        sc_cons = jnp.where(considered, sc, -jnp.inf)
        halved = considered & _top_k_mask_lm(sc_cons, k)
        considered = jnp.where(is_new_phase, halved, considered)

        # ---- root action per lane: fewest-visits-first among considered
        sel = jnp.where(considered, -N[0] * 1e4 + sc, -jnp.inf)
        root_action = jnp.argmax(sel, axis=0).astype(jnp.int32)

        # ---- masked lockstep descent (per-lane walk, whole-array algebra)
        def cond(st):
            node, action, depth, live = st
            return live.any()

        def step_down(st):
            node, action, depth, live = st
            ohm = _oh_m(node, M)
            child = jnp.where(
                ohm[:, None, :] & _oh_a(action)[None], children, 0
            ).sum((0, 1))
            term = _scal_bool(terminal, ohm)
            advance = live & (~term) & (child >= 0) & (depth < 40)
            nxt = jnp.where(advance, child, node)
            nact = jnp.where(
                advance, interior_action(N, W, P, V, legal, nxt), action
            )
            return nxt, nact, depth + advance.astype(jnp.int32), advance

        node0 = jnp.zeros(B, jnp.int32)
        live0 = jnp.ones(B, bool)
        node, action, _, _ = jax.lax.while_loop(
            cond, step_down, (node0, root_action, jnp.zeros(B, jnp.int32), live0)
        )

        # ---- expand: every lane grows node sim+1 (unless its leaf's parent
        # was already terminal — the vmapped search's `expand` mask)
        new_idx = jnp.int32(sim + 1)
        ohm = _oh_m(node, M)
        is_term = _scal_bool(terminal, ohm)
        cur_board = _board_at(boards, ohm)
        cur_player = _scal(players_t, ohm)
        nboard, winner = _apply_and_winner_lm(cur_board, cur_player, action)
        nplayer = 1 - cur_player
        nterminal = winner != 0

        npriors, nvalue, nmask = _evaluate_lm(net_apply, params, nboard, nplayer)
        can_win = _winning_actions_lm(nboard, nplayer).any(0)
        proven = nterminal | can_win
        leaf_value = jnp.where(
            nterminal, jnp.float32(-1.0),
            jnp.where(can_win, jnp.float32(1.0), nvalue),
        )

        expand = ~is_term
        # row writes at the (uniform) new node index — dynamic-update-slice
        boards = boards.at[new_idx].set(
            jnp.where(expand[None, None], nboard, boards[new_idx])
        )
        players_t = players_t.at[new_idx].set(
            jnp.where(expand, nplayer, players_t[new_idx])
        )
        terminal = terminal.at[new_idx].set(
            jnp.where(expand, proven, terminal[new_idx])
        )
        P = P.at[new_idx].set(jnp.where(expand[None], npriors, P[new_idx]))
        V = V.at[new_idx].set(jnp.where(expand, leaf_value, V[new_idx]))
        legal = legal.at[new_idx].set(
            jnp.where(expand[None], nmask, legal[new_idx])
        )
        node_value = node_value.at[new_idx].set(
            jnp.where(expand, leaf_value, node_value[new_idx])
        )
        parent = parent.at[new_idx].set(
            jnp.where(expand, node, parent[new_idx])
        )
        pa = pa.at[new_idx].set(jnp.where(expand, action, pa[new_idx]))
        # child pointer at per-lane (node, action)
        edge = ohm[:, None, :] & _oh_a(action)[None]
        children = jnp.where(edge & expand[None, None], new_idx, children)

        backup_value = jnp.where(is_term, _scal(node_value, ohm), leaf_value)
        start_node = jnp.where(is_term, node, new_idx)

        # ---- masked lockstep backup along parent pointers
        def bcond(st):
            node_, value_, N_, W_ = st
            return (node_ >= 0).any()

        def bstep(st):
            node_, value_, N_, W_ = st
            live = node_ >= 0
            nc = jnp.maximum(node_, 0)
            ohm_b = _oh_m(nc, M)
            par = jnp.where(node_ == 0, -1, _scal(parent, ohm_b))
            par = jnp.where(live, par, -1)
            act = _scal(pa, ohm_b)
            edge_value = -value_
            upd = live & (par >= 0)
            mask_e = (
                _oh_m(jnp.maximum(par, 0), M)[:, None, :]
                & _oh_a(act)[None]
                & upd[None, None]
            )
            N_ = N_ + mask_e.astype(jnp.float32)
            W_ = W_ + jnp.where(mask_e, edge_value[None, None], 0.0)
            return par, edge_value, N_, W_

        _, _, N, W = jax.lax.while_loop(
            bcond, bstep, (start_node, backup_value, N, W)
        )
        return (boards, players_t, terminal, node_value, P, V, N, W, legal,
                children, parent, pa, considered)

    carry0 = (boards, players_t, terminal, node_value, P, V, N, W, legal,
              children, parent, pa, considered0)
    carry = jax.lax.fori_loop(0, config.num_sims, simulate, carry0)
    (boards, players_t, terminal, node_value, P, V, N, W, legal, children,
     parent, pa, considered) = carry

    n0, w0 = N[0], W[0]
    root_q = jnp.where(n0 > 0, w0 / jnp.maximum(n0, 1.0), -jnp.inf)

    proven_win = (n0 > 0) & (w0 >= 0.999 * jnp.maximum(n0, 1.0))
    proven_loss = (n0 > 0) & (w0 <= -0.999 * jnp.maximum(n0, 1.0))
    final_sc = root_score(N, W) + 1e6 * proven_win - 1e6 * proven_loss
    action = jnp.argmax(
        jnp.where(considered, final_sc, -jnp.inf), axis=0
    ).astype(jnp.int32)

    root_win = _winning_actions_lm(board_lm, players)
    any_win = root_win.any(0)
    action = jnp.where(
        any_win, jnp.argmax(root_win, axis=0).astype(jnp.int32), action
    )

    q0 = jnp.where(n0 > 0, w0 / jnp.maximum(n0, 1.0), 0.0)
    v_mix0 = _mixed_value_lm(value0, q0, n0, priors0, mask0)
    q_comp = jnp.where(n0 > 0, q0, v_mix0[None])
    imp = jnp.where(
        mask0, logp0 + _sigma(q_comp, n0.max(0), config), -jnp.inf
    )
    pi_target = jax.nn.softmax(imp, axis=0)
    root_value = jnp.where(any_win, jnp.float32(1.0), v_mix0)
    return action, pi_target.T, root_q.T, n0.T, root_value


def gumbel_lm_policy(net, params, config: GumbelConfig = GumbelConfig()):
    """Tournament-compatible policy: (key, board_lm[3,9,B], current[B]) ->
    actions int32[B] (see eval/tournament.py)."""

    def net_apply(p, obs):
        return net.apply(p, obs)

    @jax.jit
    def fn(key, board_lm, current):
        actions, _, _, _, _ = gumbel_search_lm(
            net_apply, params, board_lm, current, key, config
        )
        return actions

    return fn
