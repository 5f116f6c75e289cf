"""Desktop demo loop: greedy vs greedy with randomized openings.

Equivalent of the reference's pygbag/WASM entry (/root/reference/main.py:36-55);
the asyncio browser pump is out of scope for the TPU build (SURVEY §2 C17),
so this is a plain desktop loop over the same game logic.
"""

import argparse
import time

import numpy as np

from gobblet_rl_tpu import gobblet_v1
from gobblet_rl_tpu.policies.greedy import GreedyGobbletPolicy
from gobblet_rl_tpu.policies.random_policy import random_admissible_action


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--render_mode", type=str, default="human",
                        choices=["human", "rgb_array", "text", "text_full"])
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--games", type=int, default=3)
    args = parser.parse_known_args()[0]
    if args.seed is not None:
        np.random.seed(args.seed)

    env = gobblet_v1.env(render_mode=args.render_mode, args=args)
    policies = {
        a: GreedyGobbletPolicy(depth=2) for a in ["player_1", "player_2"]
    }
    for _ in range(args.games):
        env.reset()
        ply = 0
        for agent in env.agent_iter():
            obs, reward, term, trunc, _ = env.last()
            if term or trunc:
                env.step(None)
                continue
            if ply < 2:  # randomized first two moves (main.py:36-50)
                action = random_admissible_action(obs["action_mask"])
            else:
                action = int(
                    policies[agent].compute_action(obs["observation"], obs["action_mask"])
                )
            if args.render_mode == "human":
                time.sleep(0.25)
            env.step(action)
            ply += 1
    env.close()


if __name__ == "__main__":
    main()
