"""Observation kernel: (3, 3, 13) int8 planes + 54-way action mask.

Vectorizes the reference's ``raw_env.observe``
(/root/reference/gobblet_rl/game/gobblet.py:179-215):

* the board is sign-flipped for agent 1 so own pieces are positive;
* channels 0-5 are one-hot planes for own pieces 1..6, channels 6-11 for
  opponent pieces, channel 12 is the agent-index plane;
* the action mask is the legal mask for the agent to move and all-zeros for
  the waiting agent (gobblet.py:209-214).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gobblet_rl_tpu.core import rules, rules_np
from gobblet_rl_tpu.core import types as T

# piece id for each of the 12 one-hot channels, from the own-perspective board
_CH_PIECE_NP = np.concatenate([np.arange(1, 7), -np.arange(1, 7)]).astype(np.int8)
# level each channel's piece lives on
_CH_LEVEL_NP = np.concatenate([T.PIECE_LEVEL_NP, T.PIECE_LEVEL_NP])

_CH_PIECE = jnp.asarray(_CH_PIECE_NP)
_CH_LEVEL = jnp.asarray(_CH_LEVEL_NP)


def observe_planes(board: jnp.ndarray, agent_idx: jnp.ndarray) -> jnp.ndarray:
    """int8[3, 3, 13] observation planes (gobblet.py:180-208)."""
    sign = jnp.where(agent_idx == 0, 1, -1).astype(jnp.int8)
    own = (board * sign).astype(jnp.int8)           # [3, 9]
    rows = own[_CH_LEVEL]                           # [12, 9]
    planes = (rows == _CH_PIECE[:, None]).astype(jnp.int8)      # [12, 9]
    agent_plane = jnp.full((1, T.NUM_CELLS), agent_idx, dtype=jnp.int8)
    stacked = jnp.concatenate([planes, agent_plane], axis=0)    # [13, 9]
    # squares.reshape(3,3,3) maps cell -> (cell//3, cell%3); stack on axis 2.
    return jnp.transpose(stacked.reshape(T.OBS_CHANNELS, 3, 3), (1, 2, 0))


def observe(
    board: jnp.ndarray,
    agent_idx: jnp.ndarray,
    current: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(int8[3,3,13] observation, int8[54] action_mask) for ``agent_idx``."""
    planes = observe_planes(board, agent_idx)
    mask = rules.legal_mask(board, current) & (agent_idx == current)
    return planes, mask.astype(jnp.int8)


def observe_np(board: np.ndarray, agent_idx: int, current: int):
    """Host twin of :func:`observe` for the AEC adapter."""
    sign = 1 if agent_idx == 0 else -1
    own = (board * sign).astype(np.int8)
    rows = own[_CH_LEVEL_NP]
    planes = (rows == _CH_PIECE_NP[:, None]).astype(np.int8)
    agent_plane = np.full((1, T.NUM_CELLS), agent_idx, dtype=np.int8)
    stacked = np.concatenate([planes, agent_plane], axis=0)
    obs = np.transpose(stacked.reshape(T.OBS_CHANNELS, 3, 3), (1, 2, 0))
    if agent_idx == current:
        mask = rules_np.legal_mask(board, current).astype(np.int8)
    else:
        mask = np.zeros(T.NUM_ACTIONS, dtype=np.int8)
    return obs, mask
