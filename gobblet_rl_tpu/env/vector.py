"""Batched on-device vector environment with fused rollout.

TPU-native replacement for the reference's serial ``DummyVectorEnv`` driver
(/root/reference/gobblet_rl/examples/example_tianshou_DQN.py:386-387 — a
Python for-loop over env copies): B environments live as one state pytree,
every transition is a fused kernel, auto-reset happens in-kernel, and whole
rollouts run under one ``lax.scan``.

Since round-1 profiling, the implementation is backed by the lane-major
engine (:mod:`gobblet_rl_tpu.ops.batched_core`, 171M steps/s on a v5e chip);
this module adds the user-facing contract on top: batch-first observations
in the reference layout ``int8[B, 3, 3, 13]`` plus ``bool[B, 54]`` masks.
Code that wants maximum throughput should use ``batched_core`` directly and
skip the boundary transposes.

Two-player turn alternation is lockstep (SURVEY §2): each step is one ply by
each env's own ``current`` player, replacing the AEC agent_selector loop.
Illegal actions follow the wrapped-env semantics (TerminateIllegalWrapper,
gobblet.py:114): terminate with -1 for the mover.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.ops.batched_core import PlanesState


class TimeStep(NamedTuple):
    """Per-step batch outputs (batch-first, reference observation layout)."""

    obs: jnp.ndarray       # int8[B, 3, 3, 13] — mover's observation
    mask: jnp.ndarray      # bool[B, 54] — mover's legal mask
    current: jnp.ndarray   # int32[B] — player to move in the NEW state
    rewards: jnp.ndarray   # float32[B, 2] — rewards emitted by this step
    done: jnp.ndarray      # bool[B] — episode ended at this step
    winner: jnp.ndarray    # int8[B]
    turn: jnp.ndarray      # int32[B] — turn counter of the new state


def _timestep(state: PlanesState, rewards_lm, done, winner) -> TimeStep:
    planes = bc.observe_planes_lm(state.board, state.current)
    obs = bc.to_reference_obs(planes)
    mask = bc.legal_mask_planes(state.board, state.current).T
    return TimeStep(
        obs=obs,
        mask=mask,
        current=state.current,
        rewards=rewards_lm.T,
        done=done,
        winner=winner,
        turn=state.turn,
    )


@partial(jax.jit, static_argnums=0)
def vector_reset(num_envs: int) -> tuple[PlanesState, TimeStep]:
    state = bc.reset_planes(num_envs)
    zero_r = jnp.zeros((2, num_envs), jnp.float32)
    done = jnp.zeros(num_envs, bool)
    return state, _timestep(state, zero_r, done, state.winner)


@partial(jax.jit, static_argnums=(2,))
def vector_step(
    state: PlanesState,
    actions: jnp.ndarray,
    auto_reset: bool = True,
) -> tuple[PlanesState, TimeStep]:
    """One batched ply; with ``auto_reset`` finished games restart in-kernel
    (the returned TimeStep still reports the terminal reward/done/winner)."""
    stepped = bc.step_planes(state, actions)
    done, rewards, winner = stepped.done, stepped.rewards, stepped.winner
    out = bc.autoreset_planes(stepped) if auto_reset else stepped
    return out, _timestep(out, rewards, done, winner)


class VectorGobbletEnv:
    """Thin OO wrapper for users who prefer an env object."""

    def __init__(self, num_envs: int, auto_reset: bool = True):
        self.num_envs = num_envs
        self.auto_reset = auto_reset

    def reset(self):
        return vector_reset(self.num_envs)

    def step(self, state, actions):
        return vector_step(state, actions, self.auto_reset)


# ---------------------------------------------------------------------------
# Fused rollout: policy + step under one lax.scan, zero host round-trips.
# ---------------------------------------------------------------------------
PolicyFn = Callable[[jax.Array, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
# signature: (key, obs[B,3,3,13], mask[B,54], current[B]) -> actions int32[B]


def random_policy(key, obs, mask, current):
    logits = jnp.where(mask, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnums=(3, 4, 5))
def rollout(
    state: PlanesState,
    key: jax.Array,
    first_ts: TimeStep,
    policy_fn: PolicyFn,
    num_steps: int,
    collect: bool = False,
):
    """Run ``num_steps`` fused plies.

    Returns (final_state, final_ts, key, out) where ``out`` aggregates
    episodes finished and per-player wins, or (with ``collect=True``) the
    stacked per-step TimeSteps.
    """

    def body(carry, _):
        state, ts, key = carry
        key, sub = jax.random.split(key)
        actions = policy_fn(sub, ts.obs, ts.mask, ts.current)
        state, ts = vector_step(state, actions)
        if collect:
            out = ts
        else:
            out = (
                ts.done.sum(dtype=jnp.int32),
                (ts.winner == 1).sum(dtype=jnp.int32),
                (ts.winner == -1).sum(dtype=jnp.int32),
            )
        return (state, ts, key), out

    (state, ts, key), out = jax.lax.scan(
        body, (state, first_ts, key), None, length=num_steps
    )
    if collect:
        return state, ts, key, out
    episodes, w1, w2 = out
    return state, ts, key, {
        "episodes": episodes.sum(),
        "wins_p1": w1.sum(),
        "wins_p2": w2.sum(),
    }
