from gobblet_rl_tpu.eval.tournament import (
    dqn_policy,
    greedy_policy,
    play_match,
    ppo_policy,
    random_policy,
    round_robin,
)

__all__ = [
    "play_match",
    "round_robin",
    "random_policy",
    "greedy_policy",
    "dqn_policy",
    "ppo_policy",
]
