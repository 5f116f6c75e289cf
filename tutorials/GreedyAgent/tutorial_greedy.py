"""Tutorial: watching the greedy agent play.

TPU-build mirror of /root/reference/tutorials/GreedyAgent/tutorial_greedy.py:
three rendered greedy-vs-greedy games with the first two moves randomized so
every game is different.
"""

import numpy as np

from gobblet_rl_tpu import gobblet_v1
from gobblet_rl_tpu.policies.greedy import GreedyGobbletPolicy
from gobblet_rl_tpu.policies.random_policy import random_admissible_action

if __name__ == "__main__":
    env = gobblet_v1.env(render_mode="text")
    policies = {a: GreedyGobbletPolicy(depth=2) for a in ["player_1", "player_2"]}

    for game in range(3):
        env.reset()
        np.random.seed(game)
        ply = 0
        for agent in env.agent_iter():
            obs, reward, termination, truncation, info = env.last()
            if termination or truncation:
                print(f"Game {game}: agent {agent} reward {reward}")
                env.step(None)
                continue
            if ply < 2:  # randomize the opening (tutorial_greedy.py:31-39)
                action = random_admissible_action(obs["action_mask"])
            else:
                action = int(
                    policies[agent].compute_action(obs["observation"], obs["action_mask"])
                )
            env.step(action)
            ply += 1
    env.close()
