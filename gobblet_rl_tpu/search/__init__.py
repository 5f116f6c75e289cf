from gobblet_rl_tpu.search.gumbel import (
    GumbelConfig,
    gumbel_policy,
    gumbel_search,
)
from gobblet_rl_tpu.search.mcts import MCTSConfig, mcts_policy, mcts_search

__all__ = [
    "MCTSConfig",
    "mcts_search",
    "mcts_policy",
    "GumbelConfig",
    "gumbel_search",
    "gumbel_policy",
]
