"""Round-robin Elo tournament over the framework's agents.

Beyond-reference evaluation tooling: the reference eyeballs rendered games
and a single win-rate stop criterion
(/root/reference/gobblet_rl/examples/example_tianshou_DQN.py:430-431); here
every pairing runs as a color-swapped batched match on device
(eval/tournament.py) and the standings come with an Elo fit.

    python -m gobblet_rl_tpu.examples.example_tournament \
        --agents random greedy-1 greedy-2 alphabeta-4 alphabeta-6 \
        --az-checkpoint /path/to/ckpt --games 128
"""

import argparse
import json


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--agents", type=str, nargs="*",
        default=["random", "greedy-1", "greedy-2", "alphabeta-4"],
        help="any of: random, greedy-D (batched jax greedy at depth D), "
        "alphabeta-D (native expert at depth D), solver-D (exact oracle "
        "at solve depth D; D >= 13 is perfect play)")
    parser.add_argument("--az-checkpoint", type=str, default=None,
                        help="add an 'alphazero' entry from an Orbax "
                        "checkpoint dir (train/checkpoint.py)")
    parser.add_argument("--az-sims", type=int, default=128)
    parser.add_argument("--az-model", type=str, default="conv",
                        choices=["conv", "mlp"])
    parser.add_argument("--az-num-envs", type=int, default=256,
                        help="num_envs the checkpoint was trained with "
                        "(AZState embeds the self-play env batch, so the "
                        "restore template must match)")
    parser.add_argument("--dqn-checkpoint", type=str, default=None,
                        help="add a 'dqn' entry from an Orbax checkpoint dir "
                        "(train/checkpoint.py save of a dqn.TrainState)")
    parser.add_argument("--dqn-hidden-sizes", type=int, nargs="*",
                        default=[128, 128, 128, 128])
    parser.add_argument("--dqn-dueling", action=argparse.BooleanOptionalAction,
                        default=True)
    parser.add_argument("--zoo", type=str, nargs="*", default=[],
                        help="add entries from the committed model zoo "
                        "(gobblet_rl_tpu/zoo; e.g. alphazero_gumbel32 "
                        "dqn_greedy ppo_league)")
    parser.add_argument("--zoo-search", type=str, nargs="*", default=[],
                        help="add depth-2 learned-eval search entrants over "
                        "zoo value heads (policies/value_search.py); each "
                        "NAME appears as 'NAME+search2'")
    parser.add_argument("--games", type=int, default=128,
                        help="games per pairing (color-swapped)")
    parser.add_argument("--max-plies", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--json", action="store_true",
                        help="print machine-readable results only")
    return parser


def build_policy(name: str):
    from gobblet_rl_tpu.eval import tournament

    if name == "random":
        return tournament.random_policy()
    if name.startswith("greedy-"):
        return tournament.greedy_policy(int(name.split("-")[1]))
    if name.startswith("alphabeta-"):
        return tournament.alphabeta_policy(int(name.split("-")[1]))
    if name.startswith("solver-"):
        return tournament.solver_policy(int(name.split("-")[1]))
    raise SystemExit(f"unknown agent {name!r}")


def main(args=None):
    args = args or get_parser().parse_known_args()[0]
    import jax

    from gobblet_rl_tpu.eval import tournament

    policies = {name: build_policy(name) for name in args.agents}

    for name in args.zoo:
        from gobblet_rl_tpu import zoo

        policies[name] = zoo.policy(name)

    for name in args.zoo_search:
        from gobblet_rl_tpu.policies import value_search

        policies[f"{name}+search2"] = value_search.zoo_search_policy(name)

    if args.az_checkpoint:
        from gobblet_rl_tpu.train import alphazero
        from gobblet_rl_tpu.train import checkpoint as ckpt

        config = alphazero.AZConfig(model=args.az_model,
                                    num_envs=args.az_num_envs)
        net, _, st = alphazero.init_alphazero(config, jax.random.PRNGKey(0))
        restored, step = ckpt.restore(args.az_checkpoint, st)
        if restored is None:
            raise SystemExit(f"no checkpoint in {args.az_checkpoint}")
        policies["alphazero"] = alphazero.az_policy(
            net, restored.params, num_sims=args.az_sims
        )

    if args.dqn_checkpoint:
        import optax

        from gobblet_rl_tpu.train import checkpoint as ckpt
        from gobblet_rl_tpu.train import dqn

        config = dqn.DQNConfig(hidden_sizes=tuple(args.dqn_hidden_sizes),
                               dueling=args.dqn_dueling)
        net = dqn.make_net(config)
        ts = dqn.init_train_state(config, net, optax.adam(1e-4),
                                  jax.random.PRNGKey(0))
        restored, _ = ckpt.restore(args.dqn_checkpoint, ts)
        if restored is None:
            raise SystemExit(f"no checkpoint in {args.dqn_checkpoint}")
        policies["dqn"] = tournament.dqn_policy(net, restored.params)

    res = tournament.round_robin(policies, num_games=args.games,
                                 seed=args.seed)
    if args.json:
        print(json.dumps(res))
        return res

    standings = sorted(res["standings"].items(),
                       key=lambda kv: -kv[1]["elo"])
    print(f"{'agent':<16} {'elo':>7} {'wins':>6} {'losses':>7}")
    for name, row in standings:
        print(f"{name:<16} {row['elo']:>7.1f} {row['wins']:>6} "
              f"{row['losses']:>7}")
    print()
    for pair, match in res["pairs"].items():
        print(f"{pair}: {match['wins']}-{match['losses']} "
              f"(undecided {match['undecided']})")
    return res


if __name__ == "__main__":
    main()
