from gobblet_rl_tpu.policies.alphabeta import AlphaBetaGobbletPolicy
from gobblet_rl_tpu.policies.greedy import GreedyGobbletPolicy
from gobblet_rl_tpu.policies.random_policy import (
    RandomAdmissiblePolicy,
    batched_random_admissible,
    random_admissible_action,
)

__all__ = [
    "AlphaBetaGobbletPolicy",
    "GreedyGobbletPolicy",
    "RandomAdmissiblePolicy",
    "batched_random_admissible",
    "random_admissible_action",
]
