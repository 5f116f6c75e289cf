"""Masked actor-critic models for PPO.

The action-mask handling replaces the reference's (missing) RLlib
``TorchActionMaskModel`` (/root/reference/gobblet_rl/examples/example_RLlib.py:16
imports ``gobblet_rl.models.action_mask_model``, which does not exist in the
shipped package — C14 in SURVEY §2 is broken upstream; this is the working
TPU-native equivalent): illegal logits are driven to -inf before sampling,
log-prob and entropy.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLPActorCritic(nn.Module):
    """Shared MLP torso with policy + value heads (117 -> hidden -> 54 / 1)."""

    num_actions: int = 54
    hidden_sizes: Sequence[int] = (128, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        x = obs.reshape(obs.shape[0], -1).astype(self.dtype)
        for h in self.hidden_sizes:
            x = nn.relu(nn.Dense(h, dtype=self.dtype, param_dtype=jnp.float32)(x))
        logits = nn.Dense(self.num_actions, dtype=self.dtype, param_dtype=jnp.float32)(x)
        value = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32)(x)
        return logits.astype(jnp.float32), value[..., 0].astype(jnp.float32)


class ConvActorCritic(nn.Module):
    """AlphaZero-flavored conv torso over the (3,3,13) planes.

    Input obs is flat [B, 117] in (channel, cell) order (lane-major flatten);
    it is reshaped to NHWC internally.
    """

    num_actions: int = 54
    channels: int = 64
    blocks: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        b = obs.shape[0]
        # (channel, cell) -> NHWC (cell = 3x3 row-major)
        x = obs.reshape(b, 13, 3, 3).transpose(0, 2, 3, 1).astype(self.dtype)
        x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        for _ in range(self.blocks):
            h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
            h = nn.relu(h)
            h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32)(h)
            x = nn.relu(x + h)
        x = x.reshape(b, -1)
        logits = nn.Dense(self.num_actions, dtype=self.dtype, param_dtype=jnp.float32)(x)
        value = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32)(x)
        return logits.astype(jnp.float32), value[..., 0].astype(jnp.float32)


def masked_logits(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(mask.astype(bool), logits, -1e9)


def sample_masked(key, logits, mask):
    ml = masked_logits(logits, mask)
    action = jax.random.categorical(key, ml, axis=-1)
    logp = jax.nn.log_softmax(ml, axis=-1)
    return action.astype(jnp.int32), jnp.take_along_axis(
        logp, action[:, None], axis=-1
    )[:, 0]


def logp_entropy(logits, mask, actions):
    ml = masked_logits(logits, mask)
    logp_all = jax.nn.log_softmax(ml, axis=-1)
    p = jnp.exp(logp_all)
    entropy = -jnp.sum(jnp.where(mask.astype(bool), p * logp_all, 0.0), axis=-1)
    logp = jnp.take_along_axis(logp_all, actions[:, None], axis=-1)[:, 0]
    return logp, entropy
