"""DQN training / self-play / watch / play entry point.

CLI mirror of /root/reference/gobblet_rl/examples/example_tianshou_DQN.py
(flags :28-136; train_agent :379; train_selfplay :216; watch :466; play :528)
running on the TPU-native pipeline.  Flags that only parameterized Tianshou
internals (step-per-collect, update-per-step, training/test-num) map onto the
fused-collector equivalents (segment_len, update_per_collect, num_envs).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=1626)
    parser.add_argument("--eps-test", type=float, default=0.05)
    parser.add_argument("--eps-train", type=float, default=0.1)
    parser.add_argument("--buffer-size", type=int, default=1 << 18)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument(
        "--gamma", type=float, default=0.9, help="a smaller gamma favors earlier win"
    )
    parser.add_argument("--n-step", type=int, default=3)
    parser.add_argument("--target-update-freq", type=int, default=320)
    parser.add_argument("--epoch", type=int, default=50)
    parser.add_argument("--step-per-epoch", type=int, default=64,
                        help="collect iterations per epoch")
    parser.add_argument("--step-per-collect", type=int, default=16,
                        help="learner steps per collect iteration (segment length)")
    parser.add_argument("--update-per-step", type=float, default=0.5,
                        help="gradient steps per collected learner step")
    parser.add_argument("--batch-size", type=int, default=1024)
    parser.add_argument("--hidden-sizes", type=int, nargs="*",
                        default=[128, 128, 128, 128])
    parser.add_argument("--training-num", type=int, default=1024,
                        help="parallel envs in the batched collector")
    parser.add_argument("--test-num", type=int, default=512,
                        help="parallel envs during evaluation")
    parser.add_argument("--logdir", type=str, default="log")
    parser.add_argument("--render", type=float, default=0.1)
    parser.add_argument("--render_mode", type=str, default="human",
                        choices=["human", "rgb_array", "text", "text_full"])
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--self_play", action="store_true")
    parser.add_argument("--self_play_generations", type=int, default=5)
    parser.add_argument("--self_play_greedy", action="store_true",
                        help="first generation trains against the greedy agent")
    parser.add_argument("--cpu-players", type=int, default=2, choices=[1, 2])
    parser.add_argument("--player", type=int, default=0, choices=[0, 1])
    parser.add_argument("--record", action="store_true")
    parser.add_argument("--win-rate", type=float, default=0.6,
                        help="stop criterion: expected winning rate")
    parser.add_argument("--watch", default=False, action="store_true")
    parser.add_argument("--agent-id", type=int, default=2,
                        help="the learned agent plays as the agent_id-th player")
    parser.add_argument("--resume-path", type=str, default="")
    parser.add_argument("--opponent-path", type=str, default="")
    parser.add_argument("--full-resume-dir", type=str, default="",
                        help="exact preemption resume: checkpoints params + "
                        "optimizer + env batch + replay ring + PRNG + the "
                        "epoch counter and opponent-draw RNG every epoch; an "
                        "interrupted run relaunched with the same flags "
                        "continues the epoch schedule bit-exactly")
    parser.add_argument("--zoo", type=str, default="",
                        help="watch/play with a committed zoo entry (e.g. "
                        "dqn_greedy) instead of --resume-path")
    parser.add_argument("--both-seats", action="store_true",
                        help="train one net over alternating per-env seats "
                        "(seat-agnostic; beyond the reference's pinned seat)")
    parser.add_argument("--defense-bc-weight", type=float, default=0.0,
                        help="> 0 adds solver-supervised defense "
                        "distillation (train/defense.py; measured "
                        "strength/defense trade-off in docs/RESULTS.md)")
    parser.add_argument("--opponent", type=str, default="random",
                        choices=["random", "greedy", "self", "mixed"],
                        help="training opponent; 'mixed' draws random/greedy/"
                             "self per iteration (best measured general "
                             "strength, BASELINE.md)")
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--no-double", dest="double", action="store_false",
                        help="disable double-DQN target selection")
    parser.add_argument("--no-dueling", dest="dueling", action="store_false",
                        help="disable the dueling value/advantage head")
    parser.add_argument("--eps-eval", type=float, default=0.0,
                        help="evaluation epsilon (reference tested at 0.05)")
    return parser


def get_args() -> argparse.Namespace:
    return get_parser().parse_known_args()[0]


def make_config(args):
    from gobblet_rl_tpu.train.dqn import DQNConfig

    update_per_collect = max(1, int(args.update_per_step * args.step_per_collect))
    return DQNConfig(
        seed=args.seed,
        eps_train=args.eps_train,
        eps_test=args.eps_test,
        buffer_size=args.buffer_size,
        lr=args.lr,
        gamma=args.gamma,
        n_step=args.n_step,
        target_update_freq=args.target_update_freq,
        epoch=args.epoch,
        step_per_epoch=args.step_per_epoch,
        segment_len=args.step_per_collect,
        update_per_collect=update_per_collect,
        batch_size=args.batch_size,
        hidden_sizes=tuple(args.hidden_sizes),
        num_envs=args.training_num,
        learner_player="both" if getattr(args, "both_seats", False)
        else args.agent_id - 1,
        opponent=args.opponent,
        double=getattr(args, "double", True),
        dueling=getattr(args, "dueling", True),
        eps_eval=getattr(args, "eps_eval", 0.0),
        defense_bc_weight=getattr(args, "defense_bc_weight", 0.0),
    )


def train_agent(args):
    from gobblet_rl_tpu.train import dqn
    from gobblet_rl_tpu.train.logging import make_logger

    config = make_config(args)
    logger = make_logger(os.path.join(args.logdir, "gobblet_rl_tpu", "dqn"), vars(args))
    generations = args.self_play_generations if args.self_play else 1
    if args.self_play:
        import dataclasses

        config = dataclasses.replace(
            config, opponent="greedy" if args.self_play_greedy else "self"
        )
    ts, history = dqn.train(config, logger=logger, generations=generations,
                            checkpoint_dir=os.path.join(args.logdir, "gobblet_rl_tpu", "dqn", "ckpt"),
                            full_resume_dir=(getattr(args, "full_resume_dir", "")
                                             or None))
    best = max(h["win_rate"] for h in history)
    print(f"best eval win-rate: {best:.3f} (target {args.win_rate})")
    return ts, history


def watch(args, params=None):
    """Render a game of the trained agent vs its opponent on the host env."""
    import jax

    from gobblet_rl_tpu import gobblet_v1
    from gobblet_rl_tpu.interactive.session import GameSession
    from gobblet_rl_tpu.models.mlp import masked_argmax
    from gobblet_rl_tpu.policies.greedy import GreedyGobbletPolicy
    from gobblet_rl_tpu.policies.random_policy import RandomAdmissiblePolicy
    from gobblet_rl_tpu.train import checkpoint as ckpt
    from gobblet_rl_tpu.train import dqn

    config = make_config(args)
    net = dqn.make_net(config)
    if params is None and getattr(args, "zoo", ""):
        from gobblet_rl_tpu import zoo

        net, params, _ = zoo.load(args.zoo, expect_family='dqn')
    if params is None:
        import optax

        ts = dqn.init_train_state(config, net, optax.adam(1e-4), jax.random.PRNGKey(0))
        params = ts.params
        if args.resume_path:
            params = ckpt.load_params(args.resume_path, params)

    class QPolicy:
        def compute_action(self, obs, mask):
            import jax.numpy as jnp

            flat = np.transpose(obs, (2, 0, 1)).reshape(1, -1)  # (ch, cell) order
            q = net.apply(params, jnp.asarray(flat, jnp.int8))
            return int(masked_argmax(q, jnp.asarray(mask, bool)[None])[0])

    learner = QPolicy()
    opponent = (
        GreedyGobbletPolicy(depth=2) if args.opponent == "greedy"
        else RandomAdmissiblePolicy(seed=args.seed)
    )
    agents = ["player_1", "player_2"]
    learner_agent = agents[args.agent_id - 1]
    env = gobblet_v1.env(render_mode=args.render_mode, args=args)
    policies = {a: (learner if a == learner_agent else opponent) for a in agents}
    session = GameSession(env, policies)
    while not session.episode_rewards:  # session auto-resets on game end
        session.collect(n_step=1, render=args.render if args.render_mode == "human" else 0)
    print(f"Final rewards: {session.episode_rewards}")


def play(args):
    """Human vs trained agent (example_tianshou_DQN.py:528-590)."""
    from gobblet_rl_tpu import gobblet_v1
    from gobblet_rl_tpu.interactive.session import GameSession

    recorder = None
    if args.record:
        from gobblet_rl_tpu.render.gif import GIFRecorder

        recorder = GIFRecorder()

    # reuse watch()'s QPolicy wiring via a tiny shim
    import jax
    import optax

    from gobblet_rl_tpu.models.mlp import masked_argmax
    from gobblet_rl_tpu.train import checkpoint as ckpt
    from gobblet_rl_tpu.train import dqn

    config = make_config(args)
    net = dqn.make_net(config)
    if getattr(args, "zoo", ""):
        from gobblet_rl_tpu import zoo

        net, params, _ = zoo.load(args.zoo, expect_family='dqn')
    else:
        ts = dqn.init_train_state(config, net, optax.adam(1e-4),
                                  jax.random.PRNGKey(0))
        params = ts.params
        if args.resume_path:
            params = ckpt.load_params(args.resume_path, params)

    class QPolicy:
        def compute_action(self, obs, mask):
            import jax.numpy as jnp

            flat = np.transpose(obs, (2, 0, 1)).reshape(1, -1)
            q = net.apply(params, jnp.asarray(flat, jnp.int8))
            return int(masked_argmax(q, jnp.asarray(mask, bool)[None])[0])

    env = gobblet_v1.env(render_mode="human", args=args)
    agents = ["player_1", "player_2"]
    cpu = QPolicy()
    session = GameSession(env, {a: cpu for a in agents})
    manual = gobblet_v1.ManualGobbletPolicy(env, args.player, recorder)
    while not session.episode_rewards:
        obs, _, term, trunc, _ = env.last()
        if term or trunc:
            env.step(None)
            continue
        if env.agent_selection == agents[args.player]:
            action = manual(obs, env.agent_selection)
            session.collect_result(action)
        else:
            session.collect(n_step=1)
    if recorder is not None:
        recorder.end_recording(env.unwrapped.screen)


def main(args=None):
    args = args or get_args()
    if args.watch:
        watch(args)
    elif args.cpu_players == 1:
        play(args)
    else:
        train_agent(args)


if __name__ == "__main__":
    main()
