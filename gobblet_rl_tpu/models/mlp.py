"""Flax Q-network matching the reference DQN architecture.

The reference uses Tianshou's generic ``Net`` with
``hidden_sizes=[128, 128, 128, 128]`` over the flattened (3,3,13)=117-dim
observation and a 54-way head
(/root/reference/gobblet_rl/examples/example_tianshou_DQN.py:161-166).

TPU notes: the feature dims (117 -> 128 -> 54) are already lane-friendly;
compute can run in bfloat16 on the MXU with float32 params/outputs via the
``dtype`` knob.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class QNet(nn.Module):
    """MLP Q-net; ``dueling=True`` splits the head into value + advantage
    streams (Wang et al. 2016): Q = V + A - mean(A), an upgrade knob over
    the reference's plain head."""

    num_actions: int = 54
    hidden_sizes: Sequence[int] = (128, 128, 128, 128)
    dtype: jnp.dtype = jnp.bfloat16  # MXU-friendly compute dtype
    dueling: bool = False

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        x = obs.reshape(obs.shape[0], -1).astype(self.dtype)
        for h in self.hidden_sizes:
            x = nn.Dense(h, dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.relu(x)
        if self.dueling:
            adv = nn.Dense(self.num_actions, dtype=self.dtype,
                           param_dtype=jnp.float32)(x)
            val = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32)(x)
            q = val + adv - adv.mean(axis=-1, keepdims=True)
        else:
            q = nn.Dense(self.num_actions, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        return q.astype(jnp.float32)


def masked_q(q_values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Q-values with illegal actions driven to -inf (mask-aware argmax
    matches the reference's masked action selection)."""
    return jnp.where(mask.astype(bool), q_values, -jnp.inf)


def masked_argmax(q_values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(masked_q(q_values, mask), axis=-1).astype(jnp.int32)
