from gobblet_rl_tpu.search.mcts import MCTSConfig, mcts_policy, mcts_search

__all__ = ["MCTSConfig", "mcts_search", "mcts_policy"]
