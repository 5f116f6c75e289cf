"""Gumbel MCTS (sequential halving at the root), pure JAX.

Implements the root procedure of "Policy improvement by planning with
Gumbel" (Danihelka et al., ICLR 2022) over the same fixed-shape batched
tree machinery as :mod:`gobblet_rl_tpu.search.mcts`:

* root: sample Gumbel noise g[54]; the initial candidate set is the top
  ``max_considered`` legal actions by ``g + logits``; simulations are spent
  round-robin on the candidates (fewest-visits-first) and the set is halved
  between phases, ranking by ``g + logits + sigma(q)`` with
  ``sigma(q) = (c_visit + max_N) * c_scale * q``;
* interior nodes: deterministic selection by the improved policy —
  ``argmax pi'(a) - N(a)/(1 + sum N)`` with
  ``pi' = softmax(logits + sigma(completedQ))`` — no PUCT, no prior noise;
* the returned training target is the improved policy at the root with
  COMPLETED Q-values: visited children use their search Q, unvisited ones
  use the paper's mixed-value estimator
  ``v_mix = (v_hat + sum_N * weighted_avg_{N>0}(pi, q)) / (1 + sum_N)``
  (Danihelka et al. 2022, App. D) — the same estimator drives interior
  selection and is returned per root as a bootstrap value target for plies
  of games that do not finish inside a self-play segment
  (train/alphazero.py).  The improved policy is a guaranteed policy
  improvement even at very low simulation counts, which is why gumbel
  self-play matches PUCT quality with ~2-4x fewer simulations.

Like the PUCT search, expansion runs the exact 1-ply solver
(:func:`gobblet_rl_tpu.search.mcts._mover_can_win`) so proven wins/losses
are certified rather than estimated.

The reference has no search beyond the depth-3 greedy scan
(/root/reference/gobblet_rl/game/greedy_policy.py:158-208); this module is
beyond-parity capability.

Performance note (round 4): this vmapped, batch-first-tree formulation is
kept as the readable reference implementation; the lane-major twin
:mod:`gobblet_rl_tpu.search.gumbel_lm` produces bit-identical trees under
zeroed root noise and measures 4.6x faster at its knee (188k vs 41k
moves/s at 32 sims on v5e) with no >1k-lane throughput cliff — training
and benchmarks default to it (AZConfig(search="gumbel_lm")).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from gobblet_rl_tpu.search.mcts import (
    _apply_and_winner,
    _evaluate,
    _mover_can_win,
    _winning_actions,
)


@dataclasses.dataclass(frozen=True)
class GumbelConfig:
    num_sims: int = 32
    max_considered: int = 16   # initial root candidate count (m)
    c_visit: float = 50.0
    c_scale: float = 0.1


def _phase_table(num_sims: int, max_considered: int) -> np.ndarray:
    """Static per-simulation phase index for sequential halving.

    Phase p considers max(2, m >> p) candidates; the budget is split evenly
    over phases (the remainder goes to the last phase)."""
    m = max(2, max_considered)
    phases = max(1, int(math.ceil(math.log2(m))))
    per = max(1, num_sims // phases)
    table = np.minimum(np.arange(num_sims) // per, phases - 1)
    return table.astype(np.int32)


def _considered_counts(max_considered: int, num_phases: int) -> np.ndarray:
    m = max(2, max_considered)
    return np.array([max(2, m >> p) for p in range(num_phases)], np.int32)


def _top_k_mask(score: jnp.ndarray, k) -> jnp.ndarray:
    """bool[54]: entries whose value is >= the k-th largest (tie-inclusive,
    identical to ``score >= jnp.sort(score)[-k]`` for any traced k).

    Rank counting instead of sort: a [54,54] pairwise comparison vectorizes
    on the VPU, while XLA's variadic sort is a serial network — measured
    ~1 ms per [512,54] sort on v5e, paid once per simulation in the
    sequential-halving loop."""
    rank = (score[None, :] > score[:, None]).sum(axis=1)
    return rank < k


def _sigma(q: jnp.ndarray, max_n: jnp.ndarray, config: GumbelConfig) -> jnp.ndarray:
    return (config.c_visit + max_n) * config.c_scale * q


def _improved_logits(logp, q, n, value_est, max_n, legal, config):
    """logits + sigma(completedQ): visited children use search Q, unvisited
    fall back to the node's value estimate (callers pass the mixed value)."""
    completed = jnp.where(n > 0, q, value_est)
    return jnp.where(legal, logp + _sigma(completed, max_n, config), -jnp.inf)


def _mixed_value(v_hat, q, n, priors, legal):
    """Paper's mixed-value estimator (Danihelka et al. 2022, App. D):
    ``(v_hat + sum_N * (sum_{N>0} pi q / sum_{N>0} pi)) / (1 + sum_N)``,
    falling back to the raw network value when nothing is visited."""
    visited = (n > 0) & legal
    pi = jnp.where(legal, priors, 0.0)
    pi = pi / jnp.maximum(pi.sum(), 1e-12)
    w_vis = jnp.where(visited, pi, 0.0).sum()
    q_avg = jnp.where(visited, pi * q, 0.0).sum() / jnp.maximum(w_vis, 1e-12)
    sum_n = n.sum()
    v_mix = (v_hat + sum_n * q_avg) / (1.0 + sum_n)
    return jnp.where(w_vis > 0, v_mix, v_hat)


def gumbel_search_single(net_apply, params, board, player, key,
                         config: GumbelConfig, noise=None):
    """One root; returns (action, pi_target[54], root_q[54], visits[54]).

    ``noise`` (f32[54], optional) substitutes a pre-drawn root Gumbel
    sample for the internal draw — the two search implementations use
    different key disciplines (per-lane split here vs one [54,B] field in
    gumbel_lm), so bit-equivalence with noise ON is only testable through a
    shared tensor (tests/test_gumbel_lm.py)."""
    M = config.num_sims + 1
    phase_np = _phase_table(config.num_sims, config.max_considered)
    counts_np = _considered_counts(config.max_considered, int(phase_np[-1]) + 1)
    phase_tab = jnp.asarray(phase_np)
    counts_tab = jnp.asarray(counts_np)

    boards = jnp.zeros((M, 3, 9), jnp.int8).at[0].set(board)
    players = jnp.zeros(M, jnp.int32).at[0].set(player)
    terminal = jnp.zeros(M, bool)
    node_value = jnp.zeros(M, jnp.float32)
    P = jnp.zeros((M, 54), jnp.float32)      # masked-softmax priors
    V = jnp.zeros(M, jnp.float32)            # per-node value estimate
    N = jnp.zeros((M, 54), jnp.float32)
    W = jnp.zeros((M, 54), jnp.float32)
    legal = jnp.zeros((M, 54), bool)
    children = jnp.full((M, 54), -1, jnp.int32)
    parent = jnp.full(M, -1, jnp.int32)
    parent_action = jnp.full(M, -1, jnp.int32)

    priors0, value0, mask0 = _evaluate(net_apply, params, board, player)
    P = P.at[0].set(priors0)
    V = V.at[0].set(value0)
    legal = legal.at[0].set(mask0)

    # root Gumbel scores over legal actions; initial considered set = top-m
    g = noise if noise is not None else jax.random.gumbel(key, (54,), jnp.float32)
    logp0 = jnp.where(mask0, jnp.log(jnp.maximum(priors0, 1e-12)), -jnp.inf)
    base_score = jnp.where(mask0, g + logp0, -jnp.inf)
    m0 = counts_np[0]
    considered0 = mask0 & _top_k_mask(base_score, m0)

    def root_score(N_, W_):
        """g + logits + sigma(q) for halving/final selection."""
        n0, w0 = N_[0], W_[0]
        q0 = jnp.where(n0 > 0, w0 / jnp.maximum(n0, 1.0), 0.0)
        return jnp.where(mask0,
                         g + logp0 + _sigma(q0, n0.max(), config), -jnp.inf)

    def interior_action(tree, node):
        boards_, players_, terminal_, node_value_, P_, V_, N_, W_, legal_, *_ = tree
        n, w, leg = N_[node], W_[node], legal_[node]
        q = jnp.where(n > 0, w / jnp.maximum(n, 1.0), 0.0)
        logp = jnp.where(leg, jnp.log(jnp.maximum(P_[node], 1e-12)), -jnp.inf)
        v_mix = _mixed_value(V_[node], q, n, P_[node], leg)
        imp = _improved_logits(logp, q, n, v_mix, n.max(), leg, config)
        pi = jax.nn.softmax(imp)
        score = jnp.where(leg, pi - n / (1.0 + n.sum()), -jnp.inf)
        return jnp.argmax(score).astype(jnp.int32)

    def simulate(sim, carry):
        tree, considered = carry
        (boards, players, terminal, node_value, P, V, N, W, legal, children,
         parent, pa) = tree

        # ---- phase transition: halve the considered set by current score
        phase = phase_tab[sim]
        is_new_phase = jnp.where(sim == 0, False, phase != phase_tab[sim - 1])
        k = counts_tab[phase]
        sc = root_score(N, W)
        sc_cons = jnp.where(considered, sc, -jnp.inf)
        halved = considered & _top_k_mask(sc_cons, k)
        considered = jnp.where(is_new_phase, halved, considered)

        # ---- root action: fewest-visits-first among considered
        sel = jnp.where(considered, -N[0] * 1e4 + sc, -jnp.inf)
        root_action = jnp.argmax(sel).astype(jnp.int32)

        # ---- descend with deterministic improved-policy selection
        t = (boards, players, terminal, node_value, P, V, N, W, legal,
             children, parent, pa)

        def cond(st):
            node, action, depth = st
            return (~terminal[node]) & (children[node, action] >= 0) & (depth < 40)

        def step_down(st):
            node, action, depth = st
            nxt = children[node, action]
            return nxt, interior_action(t, nxt), depth + 1

        node, action, _ = jax.lax.while_loop(
            cond, step_down, (jnp.int32(0), root_action, jnp.int32(0))
        )

        # ---- expand (identical discipline to mcts.mcts_search_single)
        new_idx = jnp.int32(sim + 1)
        is_term = terminal[node]
        nboard, winner = _apply_and_winner(boards[node], players[node], action)
        nplayer = 1 - players[node]
        nterminal = winner != 0

        npriors, nvalue, nmask = _evaluate(net_apply, params, nboard, nplayer)
        can_win = _mover_can_win(nboard, nplayer)
        proven = nterminal | can_win
        leaf_value = jnp.where(
            nterminal, jnp.float32(-1.0),
            jnp.where(can_win, jnp.float32(1.0), nvalue),
        )

        expand = ~is_term
        boards = boards.at[new_idx].set(jnp.where(expand, nboard, boards[new_idx]))
        players = players.at[new_idx].set(jnp.where(expand, nplayer, players[new_idx]))
        terminal = terminal.at[new_idx].set(jnp.where(expand, proven, terminal[new_idx]))
        P = P.at[new_idx].set(jnp.where(expand, npriors, P[new_idx]))
        V = V.at[new_idx].set(jnp.where(expand, leaf_value, V[new_idx]))
        legal = legal.at[new_idx].set(jnp.where(expand, nmask, legal[new_idx]))
        node_value = node_value.at[new_idx].set(
            jnp.where(expand, leaf_value, node_value[new_idx])
        )
        children = children.at[node, action].set(
            jnp.where(expand, new_idx, children[node, action])
        )
        parent = parent.at[new_idx].set(jnp.where(expand, node, parent[new_idx]))
        pa = pa.at[new_idx].set(jnp.where(expand, action, pa[new_idx]))

        backup_value = jnp.where(is_term, node_value[node], leaf_value)
        start_node = jnp.where(is_term, node, new_idx)

        def bcond(st):
            node_, value_, N_, W_ = st
            return node_ >= 0

        def bstep(st):
            node_, value_, N_, W_ = st
            par = jnp.where(node_ == 0, -1, parent[node_])
            act = pa[node_]
            edge_value = -value_
            N_ = jnp.where(par >= 0, N_.at[par, act].add(1.0), N_)
            W_ = jnp.where(par >= 0, W_.at[par, act].add(edge_value), W_)
            return par, edge_value, N_, W_

        _, _, N, W = jax.lax.while_loop(
            bcond, bstep, (start_node, backup_value, N, W)
        )
        tree = (boards, players, terminal, node_value, P, V, N, W, legal,
                children, parent, pa)
        return tree, considered

    tree0 = (boards, players, terminal, node_value, P, V, N, W, legal,
             children, parent, parent_action)
    (tree, considered) = jax.lax.fori_loop(
        0, config.num_sims, simulate, (tree0, considered0)
    )
    (boards, players, terminal, node_value, P, V, N, W, legal, children,
     parent, pa) = tree

    n0, w0 = N[0], W[0]
    root_q = jnp.where(n0 > 0, w0 / jnp.maximum(n0, 1.0), -jnp.inf)

    # final action: best considered candidate by g + logits + sigma(q),
    # with search-proven outcomes dominating (tanh-bounded net values can
    # only reach exactly +-1 through terminal/solver backups — same
    # certification rule as mcts.mcts_policy)
    proven_win = (n0 > 0) & (w0 >= 0.999 * jnp.maximum(n0, 1.0))
    proven_loss = (n0 > 0) & (w0 <= -0.999 * jnp.maximum(n0, 1.0))
    final_sc = root_score(N, W) + 1e6 * proven_win - 1e6 * proven_loss
    action = jnp.argmax(jnp.where(considered, final_sc, -jnp.inf)).astype(jnp.int32)

    # exact 1-ply root override (same certification as the PUCT search)
    root_win = _winning_actions(board, player)
    action = jnp.where(root_win.any(),
                       jnp.argmax(root_win).astype(jnp.int32), action)

    # training target: improved policy over ALL legal actions (completed Q
    # with the paper's mixed-value estimator for unvisited actions);
    # pi' uses the raw network logits — no Gumbel noise in the target
    q0 = jnp.where(n0 > 0, w0 / jnp.maximum(n0, 1.0), 0.0)
    v_mix0 = _mixed_value(value0, q0, n0, priors0, mask0)
    q_comp = jnp.where(n0 > 0, q0, v_mix0)
    imp = jnp.where(mask0, logp0 + _sigma(q_comp, n0.max(), config), -jnp.inf)
    pi_target = jax.nn.softmax(imp)
    # root value estimate for bootstrap targets, certified by the exact
    # 1-ply solver: a provable root win is exactly +1
    root_value = jnp.where(root_win.any(), jnp.float32(1.0), v_mix0)
    return action, pi_target, root_q, n0, root_value


def gumbel_search(net_apply, params, boards_bf, players, key,
                  config: GumbelConfig, noise=None):
    """vmapped search: boards_bf int8[B,3,9], players int32[B] ->
    (actions int32[B], pi f32[B,54], q f32[B,54], visits f32[B,54],
    root_value f32[B] — the mixed-value estimate from the mover's
    perspective, used as a bootstrap target for unfinished games).

    ``noise`` (f32[B,54], optional) replaces the per-lane root Gumbel
    draws with pre-drawn rows (see gumbel_search_single)."""
    keys = jax.random.split(key, boards_bf.shape[0])
    if noise is None:
        fn = jax.vmap(
            lambda b, p, k: gumbel_search_single(net_apply, params, b, p, k, config)
        )
        return fn(boards_bf, players, keys)
    fn = jax.vmap(
        lambda b, p, k, g: gumbel_search_single(
            net_apply, params, b, p, k, config, noise=g
        )
    )
    return fn(boards_bf, players, keys, noise)


def gumbel_policy(net, params, config: GumbelConfig = GumbelConfig()):
    """Tournament-compatible policy: (key, board_lm[3,9,B], current[B]) ->
    actions int32[B] (see eval/tournament.py)."""

    def net_apply(p, obs):
        return net.apply(p, obs)

    @jax.jit
    def fn(key, board_lm, current):
        boards_bf = jnp.transpose(board_lm, (2, 0, 1))
        actions, _, _, _, _ = gumbel_search(
            net_apply, params, boards_bf, current, key, config
        )
        return actions

    return fn
