"""Batched on-device vector environment with fused rollout.

TPU-native replacement for the reference's serial ``DummyVectorEnv`` driver
(/root/reference/gobblet_rl/examples/example_tianshou_DQN.py:386-387 — a
Python for-loop over env copies): here B environments live as one
``GobbletState`` pytree with a leading batch axis, every transition is a
vmapped fused kernel, auto-reset happens in-kernel, and whole rollouts run
under one ``lax.scan`` so the host never touches per-step data.

Two-player turn alternation is handled in lockstep (SURVEY §2): each step is
one ply by each env's own ``current`` player; policies receive the mover's
observation and per-env current index, replacing the AEC agent_selector loop.

Illegal actions follow the wrapped-env semantics (TerminateIllegalWrapper,
gobblet.py:114): terminate with -1 for the mover.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from gobblet_rl_tpu.core import env as fenv
from gobblet_rl_tpu.core import observe as obs_kernel
from gobblet_rl_tpu.core import rules
from gobblet_rl_tpu.core import types as T
from gobblet_rl_tpu.core.types import GobbletState


class TimeStep(NamedTuple):
    """Per-step batch outputs (all leading dim B)."""

    obs: jnp.ndarray       # int8[B, 3, 3, 13] — mover's observation (post-step mover)
    mask: jnp.ndarray      # bool[B, 54] — mover's legal mask
    current: jnp.ndarray   # int32[B] — player to move in the NEW state
    rewards: jnp.ndarray   # float32[B, 2] — rewards emitted by this step
    done: jnp.ndarray      # bool[B] — episode ended at this step
    winner: jnp.ndarray    # int8[B]
    turn: jnp.ndarray      # int32[B] — turn counter of the new state


def _broadcast_reset(batch: int) -> GobbletState:
    one = fenv.reset()
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one)


def _observe_current(states: GobbletState) -> tuple[jnp.ndarray, jnp.ndarray]:
    obs = jax.vmap(obs_kernel.observe_planes)(states.board, states.current)
    mask = rules.batched_legal_mask(states.board, states.current)
    return obs, mask


def _timestep(states: GobbletState, rewards, done, winner) -> TimeStep:
    obs, mask = _observe_current(states)
    return TimeStep(
        obs=obs,
        mask=mask,
        current=states.current,
        rewards=rewards,
        done=done,
        winner=winner,
        turn=states.turn,
    )


@partial(jax.jit, static_argnums=0)
def vector_reset(num_envs: int) -> tuple[GobbletState, TimeStep]:
    states = _broadcast_reset(num_envs)
    zero_r = jnp.zeros((num_envs, 2), jnp.float32)
    done = jnp.zeros(num_envs, bool)
    return states, _timestep(states, zero_r, done, states.winner)


@partial(jax.jit, static_argnums=(2, 3))
def vector_step(
    states: GobbletState,
    actions: jnp.ndarray,
    auto_reset: bool = True,
    strict: bool = True,
) -> tuple[GobbletState, TimeStep]:
    """One batched ply; with ``auto_reset`` finished games restart in-kernel
    (the returned TimeStep still reports the terminal reward/done/winner)."""
    step = fenv.step_strict if strict else fenv.step_raw
    new = jax.vmap(step)(states, actions)
    done, rewards, winner = new.done, new.rewards, new.winner
    if auto_reset:
        fresh = _broadcast_reset(done.shape[0])
        new = jax.tree.map(
            lambda f, n: jnp.where(
                done.reshape((-1,) + (1,) * (n.ndim - 1)), f, n
            ),
            fresh,
            new,
        )
    return new, _timestep(new, rewards, done, winner)


class VectorGobbletEnv:
    """Thin OO wrapper for users who prefer an env object."""

    def __init__(self, num_envs: int, auto_reset: bool = True, strict: bool = True):
        self.num_envs = num_envs
        self.auto_reset = auto_reset
        self.strict = strict

    def reset(self):
        return vector_reset(self.num_envs)

    def step(self, states, actions):
        return vector_step(states, actions, self.auto_reset, self.strict)


# ---------------------------------------------------------------------------
# Fused rollout: policy + step under one lax.scan, zero host round-trips.
# ---------------------------------------------------------------------------
PolicyFn = Callable[[jax.Array, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
# signature: (key, obs, mask, current) -> actions int32[B]


def random_policy(key, obs, mask, current):
    logits = jnp.where(mask, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def mask_only_random_policy(key, obs, mask, current):
    del obs, current
    logits = jnp.where(mask, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnums=(3, 4, 5))
def rollout(
    states: GobbletState,
    key: jax.Array,
    first_ts: TimeStep,
    policy_fn: PolicyFn,
    num_steps: int,
    collect: bool = False,
):
    """Run ``num_steps`` fused plies.

    Returns (final_states, final_ts, key, stats) where stats aggregates
    episodes finished and per-player wins; with ``collect=True`` the stacked
    per-step TimeSteps are returned instead of aggregate stats.
    """

    def body(carry, _):
        states, ts, key = carry
        key, sub = jax.random.split(key)
        actions = policy_fn(sub, ts.obs, ts.mask, ts.current)
        states, ts = vector_step(states, actions)
        if collect:
            out = ts
        else:
            out = (
                ts.done.sum(dtype=jnp.int32),
                (ts.winner == 1).sum(dtype=jnp.int32),
                (ts.winner == -1).sum(dtype=jnp.int32),
            )
        return (states, ts, key), out

    (states, ts, key), out = jax.lax.scan(
        body, (states, first_ts, key), None, length=num_steps
    )
    if collect:
        return states, ts, key, out
    episodes, w1, w2 = out
    stats = {
        "episodes": episodes.sum(),
        "wins_p1": w1.sum(),
        "wins_p2": w2.sum(),
    }
    return states, ts, key, stats
