"""Batched policy tournaments: win-rates and Elo over thousands of games.

Evaluation tooling the reference lacks (it eyeballs rendered games and a
single win-rate stop criterion, example_tianshou_DQN.py:430-431).  Every
policy is a jittable ``(key, board_lm, current) -> actions`` function over
the lane-major engine, so a full match of B games runs as one fused program.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.policies import greedy_jax

PolicyFn = Callable[[jax.Array, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def random_policy() -> PolicyFn:
    def fn(key, board, current):
        return bc.sample_random_lm(key, bc.legal_mask_planes(board, current))

    return fn


def greedy_policy(depth: int = 2) -> PolicyFn:
    def fn(key, board, current):
        return greedy_jax.greedy_actions(key, board, current, depth)

    return fn


def _native_batch_policy(batch_fn) -> PolicyFn:
    """Lift a native batch searcher ``(boards[n,3,9], players[n], salt) ->
    actions[n]`` into a device policy via ``jax.pure_callback``: the batch
    of positions crosses to the host once per ply, the search runs natively,
    and the chosen actions come back as a device array — so it composes with
    ``play_match`` against any jittable policy (MCTS, DQN, PPO, greedy).
    Shared scaffolding for :func:`alphabeta_policy` / :func:`solver_policy`."""

    def host(board_lm, current, salt):
        boards = np.asarray(board_lm, np.int8).transpose(2, 0, 1)
        return batch_fn(boards, np.asarray(current), int(salt))

    def fn(key, board, current):
        salt = jax.random.randint(key, (), 0, np.iinfo(np.int32).max)
        if not isinstance(board, jax.core.Tracer):
            # concrete inputs (host ply loop): call straight through — the
            # axon TPU runtime rejects the callback primitive even eagerly
            return jnp.asarray(host(board, current, int(salt)), jnp.int32)
        return jax.pure_callback(
            host,
            jax.ShapeDtypeStruct(current.shape, jnp.int32),
            board, current, salt,
        )

    fn.uses_host_callback = True  # play_match auto-selects its host loop
    return fn


def alphabeta_policy(depth: int = 6) -> PolicyFn:
    """Native C++ alpha-beta expert (csrc/gobblet.cpp) as a device policy."""
    from gobblet_rl_tpu.native import engine

    engine.load()  # build the shared library before tracing
    return _native_batch_policy(
        lambda boards, players, salt: engine.alphabeta_batch(
            boards, players, depth, salt
        )
    )


def solver_policy(depth: int = 15) -> PolicyFn:
    """Ground-truth perfect play from the native exact solver
    (csrc/gobblet.cpp gob_solve_action).  The opening is a PROVEN
    first-player win in 13 plies (docs/RESULTS.md), so at depth >= 13 this
    policy converts every won position it is handed; per-lane salt varies
    only the choice among equally-fast proven wins."""
    from gobblet_rl_tpu.native import engine

    engine.load()
    return _native_batch_policy(
        lambda boards, players, salt: engine.solve_batch(
            boards, players, depth, salt
        )
    )


def dqn_policy(net, params, eps: float = 0.0) -> PolicyFn:
    """Masked (eps-)greedy Q policy from trained params."""
    from gobblet_rl_tpu.models.mlp import masked_argmax

    def fn(key, board, current):
        mask = bc.legal_mask_planes(board, current)
        q = net.apply(params, bc.features_lm(board, current).T)
        greedy = masked_argmax(q, mask.T)
        if eps == 0.0:
            return greedy
        k_u, k_r = jax.random.split(key)
        rand = bc.sample_random_lm(k_r, mask)
        explore = jax.random.uniform(k_u, greedy.shape) < eps
        return jnp.where(explore, rand, greedy)

    return fn


def ppo_policy(net, params, sample: bool = False) -> PolicyFn:
    """Masked actor policy (argmax or sampled) from trained params."""
    from gobblet_rl_tpu.models import actor_critic as ac

    def fn(key, board, current):
        mask = bc.legal_mask_planes(board, current)
        logits, _ = net.apply(params, bc.features_lm(board, current).T)
        if sample:
            a, _ = ac.sample_masked(key, logits, mask.T)
            return a
        return jnp.argmax(ac.masked_logits(logits, mask.T), axis=-1).astype(jnp.int32)

    return fn


def play_match(
    policy_a: PolicyFn,
    policy_b: PolicyFn,
    num_games: int = 512,
    max_plies: int = 100,
    seed: int = 0,
    swap_colors: bool = True,
    jit_loop: bool | None = None,
) -> Dict[str, float]:
    """A-vs-B match; with ``swap_colors`` half the games have B move first.

    Returns win/loss/undecided fractions for policy A.

    ``jit_loop=False`` runs the ply loop eagerly from the host instead of as
    one ``lax.scan`` program.  Use it when a policy needs host execution —
    e.g. :func:`alphabeta_policy`'s ``pure_callback`` — on platforms without
    host-callback support (the axon TPU runtime rejects send/recv
    callbacks); device policies inside the loop still run jitted, and the
    loop exits early once every lane is decided.  The default (``None``)
    auto-selects: host loop iff a policy is marked ``uses_host_callback``.
    """
    if jit_loop is None:
        jit_loop = not (getattr(policy_a, "uses_host_callback", False)
                        or getattr(policy_b, "uses_host_callback", False))

    def run(first_is_a: bool, key, games: int):
        state = bc.reset_planes(games)
        a_player = 0 if first_is_a else 1

        def ply_fn(state, key):
            key, ka, kb = jax.random.split(key, 3)
            act_a = policy_a(ka, state.board, state.current)
            act_b = policy_b(kb, state.board, state.current)
            actions = jnp.where(state.current == a_player, act_a, act_b)
            # no auto-reset: each lane is one game
            return bc.step_planes(state, actions), key

        if jit_loop:
            def ply(carry, _):
                state, key = carry
                state, key = ply_fn(state, key)
                return (state, key), None

            (state, key), _ = jax.lax.scan(ply, (state, key), None,
                                           length=max_plies)
        else:
            for _ in range(max_plies):
                state, key = ply_fn(state, key)
                if bool((state.winner != 0).all()):
                    break
        final = state.winner  # frozen at first win
        a_sign = 1 if a_player == 0 else -1
        wins = (final == a_sign).sum()
        losses = (final == -a_sign).sum()
        return int(wins), int(losses), games - int(wins) - int(losses)

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    if swap_colors:
        half = num_games // 2
        w1, l1, u1 = run(True, k1, half)
        w2, l2, u2 = run(False, k2, num_games - half)
        wins, losses, undecided = w1 + w2, l1 + l2, u1 + u2
    else:
        wins, losses, undecided = run(True, k1, num_games)
    return {
        "games": num_games,
        "wins": wins,
        "losses": losses,
        "undecided": undecided,
        "win_rate": wins / max(wins + losses, 1),
    }


def defense_audit(
    policy: PolicyFn,
    num_games: int = 32,
    seed: int = 0,
    depth: int = 18,
    max_plies: int = 60,
    solve_fn=None,
    oracle_policy=None,
) -> Dict[str, float]:
    """Defense QUALITY against the perfect oracle (round-3 verdict item 5).

    As second player the game is a proven forced loss, so a raw loss rate
    cannot discriminate agents.  This audit plays ``policy`` as P2 against
    the exact solver's fastest attack and grades every defensive move with
    the solver's mate distances (csrc/gobblet.cpp mate scale
    ``|score| = 30000 - plies-to-mate``): with the agent to move in a
    position lost in ``d`` plies, optimal defense reaches a position lost
    in exactly ``d - 1``; any move landing at ``d' < d - 1`` provably
    shortened its own mate and is a mistake.

    Returns aggregates over ``num_games`` games:
    ``mean_plies_survived`` (oracle attacks fastest, so game length IS the
    defense metric; the theoretical maximum from the opening is measured
    by auditing the solver itself), ``mean_first_mistake_ply`` (absolute
    ply index of the first provable mistake, over games that contain one),
    ``clean_game_frac`` (games with no provable mistake) and
    ``mistakes_per_game``.

    ``solve_fn(board27, player) -> (proven, mate_in)`` and
    ``oracle_policy`` are injectable for tests; the defaults are the
    native exact solver / its policy.
    """
    if solve_fn is None:
        from gobblet_rl_tpu.native import engine

        engine.load()

        def solve_fn(board27, player):
            res = engine.solve(board27, player=player, max_depth=depth)
            return res["proven"], res["mate_in"]

    oracle = oracle_policy if oracle_policy is not None else solver_policy(depth=depth)
    state = bc.reset_planes(num_games)
    key = jax.random.PRNGKey(seed)
    first_mistake = np.full(num_games, -1, np.int32)
    mistakes = np.zeros(num_games, np.int32)
    unproven = 0
    ungraded = np.zeros(num_games, bool)  # game contains an unproven position

    def boards27(state):
        # lane-major [3,9,B] -> per-game level-major int8[27] rows
        return np.asarray(state.board).transpose(2, 0, 1).reshape(num_games, 27)

    for ply in range(max_plies):
        done_before = np.asarray(state.done)
        if done_before.all():
            break
        mover = int(np.asarray(state.current)[~done_before][0])
        key, sub = jax.random.split(key)
        if mover == 0:
            actions = oracle(sub, state.board, state.current)
            state = bc.step_planes(state, actions)
        else:
            d_before = np.full(num_games, -1, np.int32)
            for g in np.flatnonzero(~done_before):
                proven, mate = solve_fn(boards27(state)[g], 1)
                if proven and mate is not None:
                    d_before[g] = mate
                else:  # pragma: no cover - depth too shallow to prove
                    unproven += 1
                    ungraded[g] = True
            actions = policy(sub, state.board, state.current)
            state = bc.step_planes(state, actions)
            done_now = np.asarray(state.done)
            after = boards27(state)
            for g in np.flatnonzero(~done_before):
                if d_before[g] < 0:
                    continue
                if done_now[g]:
                    d_after = 0  # the move lost on the spot
                else:
                    proven, mate = solve_fn(after[g], 0)
                    if not proven or mate is None:  # pragma: no cover
                        unproven += 1
                        ungraded[g] = True
                        continue
                    d_after = mate
                if d_after < d_before[g] - 1:
                    mistakes[g] += 1
                    if first_mistake[g] < 0:
                        first_mistake[g] = ply + 1  # 1-based absolute ply

    # state.turn counts legal plies and freezes at game end: it IS the
    # per-game survival length (undecided games sit at the ply cap)
    lengths = np.asarray(state.turn)
    with_mistake = first_mistake[first_mistake > 0]
    # a game is "clean" only if EVERY defensive move in it was graded and
    # none was a mistake — games containing unproven positions cannot claim
    # a clean defense (they'd bias clean_game_frac upward at shallow solve
    # depths; round-4 advisor finding) and are reported separately
    graded = ~ungraded
    clean = (first_mistake < 0) & graded
    return {
        "games": num_games,
        "mean_plies_survived": float(lengths.mean()),
        "min_plies_survived": int(lengths.min()),
        "max_plies_survived": int(lengths.max()),
        "mean_first_mistake_ply": (
            float(with_mistake.mean()) if with_mistake.size else None
        ),
        "clean_game_frac": float(clean.sum() / max(int(graded.sum()), 1)),
        "ungraded_games": int(ungraded.sum()),
        "mistakes_per_game": float(mistakes.mean()),
        "unproven_positions": unproven,
    }


def round_robin(
    policies: Dict[str, PolicyFn],
    num_games: int = 256,
    seed: int = 0,
) -> Dict[str, Dict]:
    """All-pairs matches + simple Elo fit (400-scale, 32k games anchor)."""
    names = list(policies)
    results: Dict[str, Dict] = {n: {"wins": 0, "losses": 0} for n in names}
    pair_results = {}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            match = play_match(policies[a], policies[b], num_games, seed=seed)
            pair_results[(a, b)] = match
            results[a]["wins"] += match["wins"]
            results[a]["losses"] += match["losses"]
            results[b]["wins"] += match["losses"]
            results[b]["losses"] += match["wins"]

    # iterative Elo fit over pairwise scores
    elo = {n: 1000.0 for n in names}
    for _ in range(200):
        for (a, b), match in pair_results.items():
            total = match["wins"] + match["losses"]
            if total == 0:
                continue
            score = match["wins"] / total
            expected = 1.0 / (1.0 + 10 ** ((elo[b] - elo[a]) / 400.0))
            delta = 8.0 * (score - expected)
            elo[a] += delta
            elo[b] -= delta
    for n in names:
        results[n]["elo"] = round(elo[n], 1)
    return {"standings": results, "pairs": {f"{a} vs {b}": m for (a, b), m in pair_results.items()}}
