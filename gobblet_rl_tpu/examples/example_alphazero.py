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
    parser.add_argument("--search", type=str, default="puct",
                        choices=["puct", "gumbel"],
                        help="gumbel (sequential halving) needs ~2-4x fewer "
                        "sims per move than puct")
    parser.add_argument("--max-considered", type=int, default=16,
                        help="gumbel: initial root candidate count")
    parser.add_argument("--model", type=str, default="conv", choices=["conv", "mlp"])
    parser.add_argument("--logdir", type=str, default="log")
    parser.add_argument("--checkpoint-dir", type=str, default=None,
                        help="save/resume the AZState pytree via Orbax "
                        "(params + optimizer + env batch)")
    parser.add_argument("--full-resume-dir", type=str, default=None,
                        help="exact preemption resume: also checkpoints the "
                        "PRNG key so an interrupted run reproduces the "
                        "uninterrupted one bit-for-bit")
    parser.add_argument("--eval-games", type=int, default=256,
                        help="post-training tournament games vs each baseline "
                        "(0 to skip)")
    parser.add_argument("--eval-sims", type=int, default=128)
    parser.add_argument("--watch", default=False, action="store_true",
                        help="skip training; render one game of the (loaded "
                        "or fresh) agent vs --opponent on the AEC env")
    parser.add_argument("--render_mode", type=str, default="text",
                        choices=["human", "text", "text_full", "rgb_array"])
    parser.add_argument("--opponent", type=str, default="greedy",
                        choices=["greedy", "random", "alphabeta"])
    parser.add_argument("--eval-alphabeta-depth", type=int, default=0,
                        help="if >0, also evaluate vs the native alpha-beta "
                        "expert at this depth")
    parser.add_argument("--agent-id", type=int, default=1, choices=[1, 2],
                        help="which seat the search agent takes in --watch")
    parser.add_argument("--zoo", type=str, default="",
                        help="--watch with a committed zoo entry (e.g. "
                        "alphazero_gumbel32) instead of --checkpoint-dir")
    return parser


class SearchAgentPolicy:
    """Host-env adapter: (obs (3,3,13), mask[54]) -> action via batched MCTS
    at B=1 (GameSession-compatible, like GreedyGobbletPolicy)."""

    def __init__(self, net, params, num_sims: int = 128, seed: int = 0):
        import jax

        from gobblet_rl_tpu.search import MCTSConfig, mcts_policy

        self._pol = mcts_policy(net, params, MCTSConfig(num_sims=num_sims))
        self._key = jax.random.PRNGKey(seed)

    def compute_action(self, obs, mask):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from gobblet_rl_tpu.policies.greedy import board_from_observation

        board, agent = board_from_observation(np.asarray(obs))
        self._key, sub = jax.random.split(self._key)
        lane_major = jnp.asarray(board)[..., None]            # [3,9,1]
        a = self._pol(sub, lane_major, jnp.asarray([agent], jnp.int32))
        return int(a[0])


def watch(args, net=None, params=None):
    """Render one game: search agent vs greedy/random on the host AEC env."""
    import jax

    from gobblet_rl_tpu import gobblet_v1
    from gobblet_rl_tpu.interactive.session import GameSession
    from gobblet_rl_tpu.policies.greedy import GreedyGobbletPolicy
    from gobblet_rl_tpu.policies.random_policy import RandomAdmissiblePolicy
    from gobblet_rl_tpu.train import alphazero
    from gobblet_rl_tpu.train import checkpoint as ckpt

    if net is None and getattr(args, "zoo", ""):
        from gobblet_rl_tpu import zoo

        net, params, _ = zoo.load(args.zoo, expect_family='alphazero')
    if net is None:
        config = alphazero.AZConfig(model=args.model)
        net, _, st = alphazero.init_alphazero(config, jax.random.PRNGKey(args.seed))
        params = st.params
        if args.checkpoint_dir:
            restored, _ = ckpt.restore(args.checkpoint_dir, st)
            if restored is not None:
                params = restored.params
    agent = SearchAgentPolicy(net, params, num_sims=args.eval_sims, seed=args.seed)
    if args.opponent == "greedy":
        opponent = GreedyGobbletPolicy(depth=2)
    elif args.opponent == "alphabeta":
        from gobblet_rl_tpu.policies import AlphaBetaGobbletPolicy

        opponent = AlphaBetaGobbletPolicy(depth=6, seed=args.seed)
    else:
        opponent = RandomAdmissiblePolicy(seed=args.seed)
    agents = ["player_1", "player_2"]
    seat = agents[args.agent_id - 1]
    env = gobblet_v1.env(render_mode=args.render_mode, args=args)
    session = GameSession(env, {a: (agent if a == seat else opponent)
                                for a in agents})
    while not session.episode_rewards:
        session.collect(n_step=1)
    print(f"Final rewards: {session.episode_rewards}")


def main(args=None):
    args = args or get_parser().parse_known_args()[0]
    from gobblet_rl_tpu.train import alphazero
    from gobblet_rl_tpu.train.logging import make_logger

    if args.watch:
        return watch(args)

    config = alphazero.AZConfig(
        seed=args.seed,
        lr=args.lr,
        iterations=args.iterations,
        num_envs=args.num_envs,
        num_sims=args.num_sims,
        segment_len=args.segment_len,
        temp_moves=args.temp_moves,
        search=args.search,
        max_considered=args.max_considered,
        model=args.model,
    )
    logger = make_logger(
        os.path.join(args.logdir, "gobblet_rl_tpu", "alphazero"), vars(args)
    )
    net, st, history = alphazero.train(
        config, logger=logger, checkpoint_dir=args.checkpoint_dir,
        full_resume_dir=args.full_resume_dir,
    )
    print(f"final: {history[-1] if history else 'resumed at end'}")

    if args.eval_games:
        from gobblet_rl_tpu.eval import tournament

        pol = alphazero.az_policy(net, st.params, num_sims=args.eval_sims)
        opponents = [
            ("random", tournament.random_policy()),
            ("greedy-1", tournament.greedy_policy(1)),
            ("greedy-2", tournament.greedy_policy(2)),
        ]
        if args.eval_alphabeta_depth > 0:
            opponents.append((
                f"alphabeta-{args.eval_alphabeta_depth}",
                tournament.alphabeta_policy(args.eval_alphabeta_depth),
            ))
        for name, opp in opponents:
            res = tournament.play_match(pol, opp, num_games=args.eval_games,
                                        seed=args.seed)
            print(f"alphazero vs {name}: {res}")
    return net, st, history


if __name__ == "__main__":
    main()
