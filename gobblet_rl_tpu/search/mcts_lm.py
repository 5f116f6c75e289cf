"""Lane-major (batch-last) PUCT MCTS — the vmapped search's fast twin.

Same algorithm as :mod:`gobblet_rl_tpu.search.mcts` (AlphaZero-style PUCT
selection, masked-softmax priors with optional root Dirichlet noise,
1-ply-solver-certified expansion, sign-flipping backup), with the tree in
the framework's lane-major layout: arrays ``[M, 54, B]`` with the env
batch on the trailing lane axis, and every per-lane tree operation
expressed as one-hot select/accumulate algebra — the layout that measured
4.6× over the vmapped batch-first tree for the Gumbel search
(search/gumbel_lm.py, docs/RESULTS.md round 4) and removes its >1k-lane
throughput cliff.  Equivalence with the vmapped search is pinned
bit-exactly under disabled root noise (tests/test_gumbel_lm.py).

The reference has no search at all beyond the depth-3 greedy scan
(/root/reference/gobblet_rl/game/greedy_policy.py:158-208).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.search.gumbel_lm import (
    A,
    _apply_and_winner_lm,
    _board_at,
    _evaluate_lm,
    _oh_a,
    _oh_m,
    _row,
    _row_bool,
    _scal,
    _scal_bool,
    _winning_actions_lm,
)
from gobblet_rl_tpu.search.mcts import MCTSConfig


def mcts_search_lm(net_apply, params, board_lm, players, key,
                   config: MCTSConfig):
    """Batched PUCT search over lane-major roots.

    board_lm int8[3, 9, B], players int32[B] ->
    (visits f32[B, 54], q f32[B, 54], root_win bool[B, 54]) — the same
    contract as mcts.mcts_search.
    """
    B = players.shape[0]
    M = config.num_sims + 1

    boards = jnp.zeros((M, 3, 9, B), jnp.int8).at[0].set(board_lm)
    players_t = jnp.zeros((M, B), jnp.int32).at[0].set(players)
    terminal = jnp.zeros((M, B), bool)
    node_value = jnp.zeros((M, B), jnp.float32)
    P = jnp.zeros((M, A, B), jnp.float32)
    N = jnp.zeros((M, A, B), jnp.float32)
    W = jnp.zeros((M, A, B), jnp.float32)
    legal = jnp.zeros((M, A, B), bool)
    children = jnp.full((M, A, B), -1, jnp.int32)
    parent = jnp.full((M, B), -1, jnp.int32)
    pa = jnp.full((M, B), -1, jnp.int32)

    priors0, _, mask0 = _evaluate_lm(net_apply, params, board_lm, players)
    if config.dirichlet_alpha > 0:
        g = jax.random.gamma(key, config.dirichlet_alpha, (A, B), jnp.float32)
        g = jnp.where(mask0, g, 0.0)
        noise = g / jnp.maximum(g.sum(0), 1e-9)
        priors0 = (1.0 - config.noise_frac) * priors0 + config.noise_frac * noise
    P = P.at[0].set(priors0)
    legal = legal.at[0].set(mask0)

    def puct_action(N_, W_, P_, legal_, node):
        ohm = _oh_m(node, M)
        n = _row(N_, ohm)
        w = _row(W_, ohm)
        p = _row(P_, ohm)
        m = _row_bool(legal_, ohm)
        q = jnp.where(n > 0, w / jnp.maximum(n, 1.0), 0.0)
        u = config.c_puct * p * jnp.sqrt(jnp.maximum(n.sum(0), 1.0)) / (1.0 + n)
        score = jnp.where(m, q + u, -jnp.inf)
        return jnp.argmax(score, axis=0).astype(jnp.int32)

    def simulate(sim, carry):
        (boards, players_t, terminal, node_value, P, N, W, legal, children,
         parent, pa) = carry

        # ---- SELECT: masked lockstep walk to an unexpanded edge/terminal
        root_action = puct_action(N, W, P, legal, jnp.zeros(B, jnp.int32))

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
            advance = live & (~term) & (child >= 0) & (depth < config.max_depth)
            nxt = jnp.where(advance, child, node)
            nact = jnp.where(
                advance, puct_action(N, W, P, legal, nxt), action
            )
            return nxt, nact, depth + advance.astype(jnp.int32), advance

        node, action, _, _ = jax.lax.while_loop(
            cond, step_down,
            (jnp.zeros(B, jnp.int32), root_action, jnp.zeros(B, jnp.int32),
             jnp.ones(B, bool)),
        )

        # ---- EXPAND at per-lane (node, action) -> node sim+1
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
        legal = legal.at[new_idx].set(
            jnp.where(expand[None], nmask, legal[new_idx])
        )
        node_value = node_value.at[new_idx].set(
            jnp.where(expand, leaf_value, node_value[new_idx])
        )
        parent = parent.at[new_idx].set(jnp.where(expand, node, parent[new_idx]))
        pa = pa.at[new_idx].set(jnp.where(expand, action, pa[new_idx]))
        edge = ohm[:, None, :] & _oh_a(action)[None]
        children = jnp.where(edge & expand[None, None], new_idx, children)

        backup_value = jnp.where(is_term, _scal(node_value, ohm), leaf_value)
        start_node = jnp.where(is_term, node, new_idx)

        # ---- BACKUP along parent pointers (masked lockstep)
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
        return (boards, players_t, terminal, node_value, P, N, W, legal,
                children, parent, pa)

    carry0 = (boards, players_t, terminal, node_value, P, N, W, legal,
              children, parent, pa)
    carry = jax.lax.fori_loop(0, config.num_sims, simulate, carry0)
    N, W = carry[5], carry[6]

    n0, w0 = N[0], W[0]
    root_q = jnp.where(n0 > 0, w0 / jnp.maximum(n0, 1.0), -jnp.inf)
    root_win = _winning_actions_lm(board_lm, players)
    return n0.T, root_q.T, root_win.T


def mcts_lm_policy(net, params, config: MCTSConfig = MCTSConfig()):
    """Tournament-compatible policy: (key, board_lm[3,9,B], current[B]) ->
    actions int32[B] — same final-selection rule as mcts.mcts_policy
    (proven outcomes dominate visit counts)."""

    def net_apply(p, obs):
        return net.apply(p, obs)

    @jax.jit
    def fn(key, board_lm, current):
        k_search, k_sample = jax.random.split(key)
        visits, q, root_win = mcts_search_lm(
            net_apply, params, board_lm, current, k_search, config
        )
        score = (visits + 1e9 * root_win + 1e6 * (q >= 0.999)
                 - 1e6 * (jnp.isfinite(q) & (q <= -0.999)))
        root_mask = bc.legal_mask_planes(board_lm, current).T
        score = jnp.where(root_mask, score, -jnp.inf)
        if config.temperature > 0:
            logits = jnp.log(jnp.maximum(score, 1e-9)) / config.temperature
            return jax.random.categorical(k_sample, logits, axis=-1).astype(jnp.int32)
        return jnp.argmax(score, axis=-1).astype(jnp.int32)

    return fn
