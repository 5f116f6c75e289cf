"""Solver-supervised defense distillation (round 5).

Motivation: the round-4 exploitability audit graded every agent's DEFENSE
with the exact solver's mate distances and found the PPO league agent
collapsing at its very first lost decision (5.0 plies survived vs the
oracle's fastest attack; random survives 5.7, optimal defense 13).  The
round-5 "search" league leg (a converting Gumbel attacker) fixed the
mistake RATE (2.0 -> 1.03 per game) but not survival: with terminal-only
rewards the only pro-survival gradient is the gamma-discount timing
difference (~0.04 in return), which PPO's normalized advantages wash out.

The direct cure is supervision: the native exact solver
(csrc/gobblet.cpp ``gob_solve_action``) already plays PERFECT defense —
in a lost position its move maximizes the mate distance (the audit
measures it at the theoretical 13 plies).  This module

* generates a **defense bank**: batched games of the oracle's fastest
  attack (P1 = ``engine.solve_batch``) against a mixture of defenders
  (random / greedy-1 / greedy-2 / the solver itself), recording at every
  live P2-to-move position the solver's optimal defensive move — i.e.
  labeled positions ON the oracle's own attack paths, exactly the
  distribution the defense audit replays;
* exposes the bank as fixed device arrays `(obs int8[N,117],
  mask bool[N,54], action int32[N])` that ``train/ppo.py`` mixes into its
  loss as a small behavior-cloning term (``PPOConfig.defense_bc_weight``).

The reference has no counterpart (no solver, no defense concept); the
closest analog is its greedy policy's loss-avoidance pruning
(/root/reference/gobblet_rl/game/greedy_policy.py:96-101).
"""

from __future__ import annotations

import numpy as np


def generate_defense_bank(num_games: int = 256, seed: int = 0,
                          depth: int = 16, max_plies: int = 40,
                          sides: str = "defense") -> dict:
    """Play ``num_games`` parallel oracle-attack games and label every live
    defensive position with the solver's mate-maximizing move.

    ``sides="both"`` additionally labels every live ATTACKING position
    (P1 to move, theoretically won) with the solver's fastest attack move
    — the P1 positions are diversified by the per-lane defender mix, so
    the attack labels cover winning lines against varied defenses (round-5
    measurement: the defense-only bank taught the PPO agent to convert
    63/64 against the solver's defense but only 23/64 against the
    alpha-beta expert's different defense).

    Returns ``{"obs": int8[N,117], "mask": bool[N,54], "action": int32[N]}``
    with byte-deduplicated positions.  Host-side (native solver); runs in
    seconds at depth 16 — the midgame tree is tiny and transposition-cached.
    """
    assert sides in ("defense", "both"), sides
    import jax
    import jax.numpy as jnp

    from gobblet_rl_tpu.native import engine
    from gobblet_rl_tpu.ops import batched_core as bc
    from gobblet_rl_tpu.policies import greedy_jax

    engine.load()
    rng = np.random.default_rng(seed)
    state = bc.reset_planes(num_games)
    # per-lane defender mix: 0 random, 1 greedy-1, 2 greedy-2, 3 solver
    # (solver lanes record the optimal 13-ply defense lines themselves)
    defender = rng.integers(0, 4, size=num_games)
    key = jax.random.PRNGKey(seed)

    seen: dict[bytes, tuple] = {}
    for ply in range(max_plies):
        done = np.asarray(state.done)
        if done.all():
            break
        boards27 = (
            np.asarray(state.board).transpose(2, 0, 1).reshape(num_games, 27)
        )
        mover = int(np.asarray(state.current)[~done][0])
        key, sub = jax.random.split(key)
        salt = int(jax.random.randint(sub, (), 0, np.iinfo(np.int32).max))
        if mover == 0:
            # the oracle's fastest attack
            actions = engine.solve_batch(
                boards27, np.zeros(num_games, np.int32), depth, salt
            )
            if sides == "both":
                mask = np.asarray(
                    bc.legal_mask_planes(state.board, state.current)
                )
                obs = np.asarray(bc.features_lm(state.board, state.current))
                for g in np.flatnonzero(~done):
                    b = (0, boards27[g].tobytes())
                    if b not in seen:
                        seen[b] = (obs[:, g], mask[:, g], int(actions[g]),
                                   boards27[g])
        else:
            # label: the solver's optimal defense per live lane
            labels = engine.solve_batch(
                boards27, np.ones(num_games, np.int32), depth, salt
            )
            mask = np.asarray(
                bc.legal_mask_planes(state.board, state.current)
            )  # [54, B]
            obs = np.asarray(bc.features_lm(state.board, state.current))
            for g in np.flatnonzero(~done):
                b = (1, boards27[g].tobytes())
                if b not in seen:
                    seen[b] = (obs[:, g], mask[:, g], int(labels[g]),
                               boards27[g])
            # actual defense move: the lane's assigned defender
            key, k1, k2, k3 = jax.random.split(key, 4)
            a_rand = np.asarray(bc.sample_random_lm(
                k1, jnp.asarray(mask)
            ))
            a_g1 = np.asarray(greedy_jax.greedy_actions(
                k2, state.board, state.current, 1
            ))
            a_g2 = np.asarray(greedy_jax.greedy_actions(
                k3, state.board, state.current, 2
            ))
            actions = np.choose(
                np.minimum(defender, 3),
                [a_rand, a_g1, a_g2, labels],
            )
        state = bc.step_planes(state, jnp.asarray(actions, jnp.int32))

    rows = list(seen.values())
    assert rows, "defense bank came out empty"
    return {
        "obs": np.stack([r[0] for r in rows]).astype(np.int8),
        "mask": np.stack([r[1] for r in rows]).astype(bool),
        "action": np.asarray([r[2] for r in rows], np.int32),
        # raw positions, for auditing the labels (not consumed by the loss)
        "board": np.stack([r[3] for r in rows]).astype(np.int8),
    }
