"""Self-play PPO entry point — working replacement for
/root/reference/gobblet_rl/examples/example_RLlib.py (shipped broken, C14)."""

import argparse
import os


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--gamma", type=float, default=0.99)
    parser.add_argument("--iterations", type=int, default=64)
    parser.add_argument("--num-envs", type=int, default=512)
    parser.add_argument("--segment-len", type=int, default=32)
    parser.add_argument("--model", type=str, default="mlp", choices=["mlp", "conv"])
    parser.add_argument("--shared-policy", action="store_true",
                        help="one policy for both players (else one per player, "
                        "like the RLlib multiagent policy mapping)")
    parser.add_argument("--learner-player", type=str, default="0",
                        choices=["0", "1", "both"],
                        help="learner seat(s) in shared-policy mode; 'both' "
                        "alternates even/odd envs (seat-agnostic training)")
    parser.add_argument("--opponent", type=str, default="self",
                        choices=["self", "random", "greedy", "pool", "search",
                                 "mixed"],
                        help="frozen in-collector opponent (shared-policy "
                        "mode); 'search' is the zoo-AZ gumbel attacker; "
                        "'mixed' is the league the zoo's ppo_league "
                        "recipe uses — plain self-play cycles "
                        "(docs/RESULTS.md)")
    parser.add_argument("--mixed-weights", type=float, nargs="+",
                        default=[0.1, 0.7, 0.2],
                        metavar="P",
                        help="opponent=mixed: per-iteration draw weights "
                        "over (random, greedy, pool[, search]) — 3 or 4 "
                        "values")
    parser.add_argument("--search-sims", type=int, default=8,
                        help="gumbel simulations of the 'search' attacker")
    parser.add_argument("--defense-bc-weight", type=float, default=0.0,
                        help="> 0 adds solver-supervised defense "
                        "distillation (train/defense.py)")
    parser.add_argument("--logdir", type=str, default="log")
    parser.add_argument("--checkpoint-dir", type=str, default=None,
                        help="full-resume checkpoints (params + optimizer + "
                        "env batches + PRNG + league pool + opponent-draw "
                        "RNG) saved every iteration; an interrupted run "
                        "relaunched with the same flags resumes bit-exactly")
    parser.add_argument("--resume", action="store_true",
                        help="explicit opt-in alias: with --checkpoint-dir "
                        "the run auto-resumes from the latest step anyway; "
                        "--resume alone errors to catch a missing dir")
    return parser


def main(args=None):
    args = args or get_parser().parse_known_args()[0]
    from gobblet_rl_tpu.train import ppo
    from gobblet_rl_tpu.train.logging import make_logger

    config = ppo.PPOConfig(
        seed=args.seed,
        lr=args.lr,
        gamma=args.gamma,
        iterations=args.iterations,
        num_envs=args.num_envs,
        segment_len=args.segment_len,
        model=args.model,
        shared_policy=args.shared_policy,
        learner_player=(args.learner_player if args.learner_player == "both"
                        else int(args.learner_player)),
        opponent=args.opponent,
        mixed_weights=tuple(args.mixed_weights),
        search_sims=args.search_sims,
        defense_bc_weight=args.defense_bc_weight,
    )
    if getattr(args, "resume", False) and not args.checkpoint_dir:
        raise SystemExit("--resume requires --checkpoint-dir")
    logger = make_logger(os.path.join(args.logdir, "gobblet_rl_tpu", "ppo"), vars(args))
    st, history = ppo.train(
        config, logger=logger, full_resume_dir=args.checkpoint_dir
    )
    print(f"final: {history[-1] if history else 'resumed at end'}")
    return st, history


if __name__ == "__main__":
    main()
