"""AlphaZero self-play training entry point.

Beyond-reference capability: the reference's strongest agent is DQN trained
against a depth-2 greedy opponent
(/root/reference/gobblet_rl/examples/example_tianshou_DQN.py:199-202); here a
single policy/value network is trained from batched MCTS self-play and
evaluated (with search) against the greedy baselines.
"""

import argparse
import os


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--lr", type=float, default=2e-3)
    parser.add_argument("--iterations", type=int, default=32)
    parser.add_argument("--num-envs", type=int, default=256)
    parser.add_argument("--num-sims", type=int, default=64)
    parser.add_argument("--segment-len", type=int, default=48)
    parser.add_argument("--temp-moves", type=int, default=8)
    parser.add_argument("--model", type=str, default="conv", choices=["conv", "mlp"])
    parser.add_argument("--logdir", type=str, default="log")
    parser.add_argument("--checkpoint-dir", type=str, default=None,
                        help="save/resume full AZState via Orbax")
    parser.add_argument("--eval-games", type=int, default=256,
                        help="post-training tournament games vs each baseline "
                        "(0 to skip)")
    parser.add_argument("--eval-sims", type=int, default=128)
    return parser


def main(args=None):
    args = args or get_parser().parse_known_args()[0]
    from gobblet_rl_tpu.train import alphazero
    from gobblet_rl_tpu.train.logging import make_logger

    config = alphazero.AZConfig(
        seed=args.seed,
        lr=args.lr,
        iterations=args.iterations,
        num_envs=args.num_envs,
        num_sims=args.num_sims,
        segment_len=args.segment_len,
        temp_moves=args.temp_moves,
        model=args.model,
    )
    logger = make_logger(
        os.path.join(args.logdir, "gobblet_rl_tpu", "alphazero"), vars(args)
    )
    net, st, history = alphazero.train(
        config, logger=logger, checkpoint_dir=args.checkpoint_dir
    )
    print(f"final: {history[-1] if history else 'resumed at end'}")

    if args.eval_games:
        from gobblet_rl_tpu.eval import tournament

        pol = alphazero.az_policy(net, st.params, num_sims=args.eval_sims)
        for name, opp in [
            ("random", tournament.random_policy()),
            ("greedy-1", tournament.greedy_policy(1)),
            ("greedy-2", tournament.greedy_policy(2)),
        ]:
            res = tournament.play_match(pol, opp, num_games=args.eval_games,
                                        seed=args.seed)
            print(f"alphazero vs {name}: {res}")
    return net, st, history


if __name__ == "__main__":
    main()
