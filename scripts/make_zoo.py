"""Train the flagship agents and (re)build the committed model zoo.

One TPU run (~30 min) reproduces every entry in ``gobblet_rl_tpu/zoo/``:

    python scripts/make_zoo.py             # full recipes from docs/RESULTS.md
    python scripts/make_zoo.py --quick     # tiny smoke recipes (CI/CPU)

Each entry is saved as a single flax msgpack blob plus a manifest row
recording the recipe and the measured strength (256 color-swapped games per
opponent via eval/tournament.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny recipes for smoke-testing the pipeline")
    p.add_argument("--entries", nargs="*",
                   default=["alphazero_gumbel32", "dqn_greedy", "ppo_league"])
    p.add_argument("--eval-games", type=int, default=256)
    p.add_argument("--seed", type=int, default=1626)
    return p.parse_known_args()[0]


def measure(policy, eval_games: int, seed: int, opponents=("random", "greedy-1", "greedy-2")):
    from gobblet_rl_tpu.eval import tournament

    build = {
        "random": tournament.random_policy,
        "greedy-1": lambda: tournament.greedy_policy(1),
        "greedy-2": lambda: tournament.greedy_policy(2),
    }
    out = {}
    for name in opponents:
        res = tournament.play_match(policy, build[name](), num_games=eval_games,
                                    seed=seed)
        out[f"vs_{name}"] = round(res["win_rate"], 3)
        print(f"  vs {name}: {res}", flush=True)
    return out


def make_alphazero(args):
    from gobblet_rl_tpu import zoo
    from gobblet_rl_tpu.train import alphazero

    # gumbel_lm: same algorithm as "gumbel", lane-major tree — the whole
    # recipe runs in ~6 min instead of ~16 with equal-or-better results
    # (measured round 4: value loss 0.0015 vs 0.0064, 0.926 vs greedy-2)
    config = alphazero.AZConfig(
        search="gumbel_lm", num_sims=32, iterations=8 if args.quick else 100,
        num_envs=64 if args.quick else 512, segment_len=48, temp_moves=8,
        model="conv", seed=args.seed,
    )
    t0 = time.time()
    net, st, history = alphazero.train(config)
    mins = (time.time() - t0) / 60
    print(f"alphazero trained in {mins:.1f} min; "
          f"final value loss {history[-1]['value_loss']:.4f}", flush=True)
    eval_kw = {"num_sims": 32 if args.quick else 128}
    metrics = measure(alphazero.az_policy(net, st.params, **eval_kw),
                      args.eval_games, args.seed)
    metrics["final_value_loss"] = round(history[-1]["value_loss"], 4)
    metrics["train_minutes"] = round(mins, 1)
    zoo.save("alphazero_gumbel32", st.params, {
        "family": "alphazero",
        "net": {"model": "conv", "channels": config.channels,
                "blocks": config.blocks},
        "eval": {"num_sims": 128},
        "recipe": (f"scripts/make_zoo.py: AZConfig(search="
                   f"'{config.search}', "
                   f"num_sims=32, iterations={config.iterations}, "
                   f"num_envs={config.num_envs}, segment_len=48, "
                   f"model='conv', seed={args.seed})"),
        "metrics": metrics,
    })


def make_dqn(args):
    from gobblet_rl_tpu import zoo
    from gobblet_rl_tpu.eval import tournament
    from gobblet_rl_tpu.train import dqn

    config = dqn.DQNConfig(
        opponent="greedy", epoch=4 if args.quick else 120,
        step_per_epoch=4 if args.quick else 24,
        num_envs=64 if args.quick else 1024, seed=args.seed,
        learner_player="both",   # seat-agnostic: honest color-swapped play
    )
    t0 = time.time()
    ts, history = dqn.train(config)
    mins = (time.time() - t0) / 60
    print(f"dqn trained in {mins:.1f} min; "
          f"final eval win-rate {history[-1]['win_rate']:.3f}", flush=True)
    net = dqn.make_net(config)
    metrics = measure(tournament.dqn_policy(net, ts.params),
                      args.eval_games, args.seed)
    metrics["final_greedy_eval_win_rate"] = round(history[-1]["win_rate"], 3)
    metrics["train_minutes"] = round(mins, 1)
    zoo.save("dqn_greedy", ts.params, {
        "family": "dqn",
        "net": {"hidden_sizes": list(config.hidden_sizes),
                "dueling": config.dueling},
        "recipe": (f"scripts/make_zoo.py: DQNConfig(opponent='greedy', "
                   f"epoch={config.epoch}, step_per_epoch={config.step_per_epoch}, "
                   f"num_envs={config.num_envs}, double/dueling on, "
                   f"learner_player='both', seed={args.seed})"),
        "metrics": metrics,
    })


def make_ppo(args):
    from gobblet_rl_tpu import zoo
    from gobblet_rl_tpu.eval import tournament
    from gobblet_rl_tpu.train import ppo

    # Greedy-heavy snapshot league + two round-5 legs (measured sweep,
    # docs/RESULTS.md): a converting Gumbel-search attacker (the committed
    # AZ zoo net — punishes lost positions, which greedy/pool never did)
    # and solver-supervised defense distillation (defense_bc_weight=1.0
    # over a 384-game oracle-attack bank).  The winning mix vs greedy-2 /
    # defense plies (old 3-leg league: 0.844 / 5.0, below random):
    #   (0.1, 0.6, 0.2, 0.1) sims=4 1000 it, bank sides='both'
    #                                       -> 0.906 / 13.0 (PERFECT)  <- shipped
    #     (attack labels lift conversion vs the alpha-beta defense
    #      36% -> 53% while conversion vs the solver defense stays 32/32)
    #   same, defense-only bank             -> 0.898 / 13.0
    #   (0.1, 0.5, 0.2, 0.2) sims=8  800 it -> 0.79  / 13.0
    #   bc weight 3.0 over-regularizes      -> 0.656 / 13.0
    # NOTE: run after make_alphazero — the search leg loads the committed
    # AZ blob.
    # quick smoke runs may target ppo_league alone into an empty zoo dir —
    # drop the search leg when its AZ blob is absent
    have_az = "alphazero_gumbel32" in zoo.names()
    config = ppo.PPOConfig(
        shared_policy=True, learner_player="both", opponent="mixed",
        mixed_weights=((0.1, 0.6, 0.2, 0.1) if have_az else (0.1, 0.7, 0.2)),
        search_sims=4,
        defense_bc_weight=1.0,
        defense_bank_games=16 if args.quick else 384,
        defense_bank_depth=12 if args.quick else 16,
        defense_bank_sides="both",
        iterations=8 if args.quick else 1000,
        num_envs=64 if args.quick else 512, seed=args.seed,
    )
    t0 = time.time()
    st, history = ppo.train(config)
    mins = (time.time() - t0) / 60
    print(f"ppo trained in {mins:.1f} min", flush=True)
    net = ppo.make_net(config)
    pol = tournament.ppo_policy(net, st.params[0])
    metrics = measure(pol, args.eval_games, args.seed)
    if not args.quick:
        d = tournament.defense_audit(pol, num_games=32, seed=args.seed,
                                     depth=16)
        metrics["defense_plies_survived"] = round(d["mean_plies_survived"], 1)
        metrics["defense_mistakes_per_game"] = round(d["mistakes_per_game"], 2)
        print(f"  defense audit: {d}", flush=True)
    metrics["train_minutes"] = round(mins, 1)
    zoo.save("ppo_league", st.params[0], {
        "family": "ppo",
        "net": {"hidden_sizes": list(config.hidden_sizes)},
        "recipe": (f"scripts/make_zoo.py: PPOConfig(shared_policy=True, "
                   f"learner_player='both', opponent='mixed', "
                   f"mixed_weights={config.mixed_weights}, "
                   f"search_sims={config.search_sims}, "
                   f"defense_bc_weight={config.defense_bc_weight}, "
                   f"defense_bank_games={config.defense_bank_games}, "
                   f"defense_bank_sides='{config.defense_bank_sides}', "
                   f"iterations={config.iterations}, num_envs={config.num_envs}, "
                   f"seed={args.seed})"),
        "metrics": metrics,
    })


def main():
    args = parse_args()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"device: {jax.devices()[0]}", flush=True)

    makers = {"alphazero_gumbel32": make_alphazero, "dqn_greedy": make_dqn,
              "ppo_league": make_ppo}
    for name in args.entries:
        print(f"=== {name} ===", flush=True)
        makers[name](args)

    from gobblet_rl_tpu import zoo

    print(json.dumps({n: zoo.meta(n)["metrics"] for n in zoo.names()}, indent=2))


if __name__ == "__main__":
    main()
