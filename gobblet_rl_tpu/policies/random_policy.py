"""Random-admissible policies: host (numpy) and batched on-device (JAX).

Host variant matches the sampling used across the reference examples
(/root/reference/gobblet_rl/examples/example_basic.py:58-61 and
random_admissible_policy_rllib.py:23-30): uniform over the action mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def random_admissible_action(mask: np.ndarray, rng: np.random.Generator | None = None) -> int:
    """Uniform draw from legal actions (example_basic.py:58-61 uses
    np.random.choice over mask indices)."""
    legal = np.nonzero(np.asarray(mask).flatten())[0]
    if rng is None:
        return int(np.random.choice(legal))
    return int(rng.choice(legal))


def batched_random_admissible(key: jax.Array, masks: jnp.ndarray) -> jnp.ndarray:
    """int32[B] uniform-over-mask actions for a batch of envs, on device."""
    logits = jnp.where(masks.astype(bool), 0.0, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


class RandomAdmissiblePolicy:
    """Object wrapper mirroring the RLlib adapter's behavior
    (random_admissible_policy_rllib.py:10-40)."""

    def __init__(self, seed: int | None = None):
        self.rng = np.random.default_rng(seed)

    def compute_action(self, obs, mask) -> int:
        return random_admissible_action(mask, self.rng)

    def compute_actions(self, obs_batch):
        masks = obs_batch["action_mask"]
        return [random_admissible_action(m, self.rng) for m in masks]
