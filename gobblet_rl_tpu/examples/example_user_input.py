"""Interactive AEC loop with 0-2 human players — mirror of
/root/reference/gobblet_rl/examples/example_user_input.py."""

import argparse

import numpy as np

from gobblet_rl_tpu import gobblet_v1
from gobblet_rl_tpu.policies.random_policy import random_admissible_action


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--cpu-players", type=int, default=1, choices=[0, 1, 2],
        help="Number of CPU players (example_user_input.py:16-21)",
    )
    parser.add_argument("--player", type=int, default=0, choices=[0, 1])
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--screen-width", type=int, default=640)
    return parser


def main(args=None):
    args = args or get_parser().parse_known_args()[0]
    if args.seed is not None:
        np.random.seed(args.seed)

    env = gobblet_v1.env(render_mode="human", args=args)
    env.reset()

    human_agents = []
    if args.cpu_players < 2:
        human_agents.append(env.agents[args.player])
    if args.cpu_players == 0:
        human_agents.append(env.agents[1 - args.player])

    manual = gobblet_v1.ManualGobbletPolicy(env, args.player)

    for agent in env.agent_iter():
        observation, reward, termination, truncation, info = env.last()
        if termination or truncation:
            env.step(None)
            continue
        if agent in human_agents:
            action = manual(observation, agent)
        else:
            action = random_admissible_action(observation["action_mask"])
        env.step(int(action))


if __name__ == "__main__":
    main()
