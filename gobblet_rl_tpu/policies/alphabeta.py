"""Alpha-beta expert policy over the native C++ engine.

Beyond-reference capability: the reference's strongest scripted agent is
the depth-3 greedy scan (/root/reference/gobblet_rl/game/greedy_policy.py:
158-208), which only finds forced wins/blocks one ply out.  This policy
runs iterative-deepening negamax with a Zobrist transposition table
(csrc/gobblet.cpp) and exposes the same ``compute_action(obs, mask)``
interface as :class:`~gobblet_rl_tpu.policies.greedy.GreedyGobbletPolicy`,
so it plugs into GameSession, the AEC examples, and the framework adapters
unchanged.
"""

from __future__ import annotations

import numpy as np

from gobblet_rl_tpu.policies.greedy import board_from_observation


class AlphaBetaGobbletPolicy:
    """Host-side expert: reconstructs the board from the (3,3,13)
    observation and asks the native engine for the alpha-beta move."""

    def __init__(self, depth: int = 6, seed: int = 0):
        from gobblet_rl_tpu.native import engine

        self.lib = engine.load()
        self.depth = depth
        self._salt = np.uint64((seed << 1) | 1)

    def compute_action(self, obs, mask) -> int:
        board, agent = board_from_observation(np.asarray(obs))
        flat = np.ascontiguousarray(board.reshape(27), np.int8)
        # fresh salt per move: varies tie-breaking between games without
        # changing playing strength (eval jitter, csrc/gobblet.cpp)
        self._salt = np.uint64(
            (int(self._salt) * 6364136223846793005 + 1442695040888963407)
            % 2**64
        )
        action = int(
            self.lib.gob_alphabeta_action(flat, agent, self.depth,
                                          int(self._salt))
        )
        if action < 0 or not np.asarray(mask)[action]:
            legal = np.flatnonzero(np.asarray(mask))
            return int(legal[0]) if legal.size else 0
        return action

    # same adapter surface as GreedyGobbletPolicy (greedy_policy.py:33-36)
    def compute_action_tianshou(self, obs, mask):
        return self.compute_action(obs, mask)
