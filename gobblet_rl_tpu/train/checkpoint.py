"""Orbax checkpointing of the full training state.

Replaces the reference's ``torch.save(state_dict)`` best-model dump
(/root/reference/gobblet_rl/examples/example_tianshou_DQN.py:418-428) with a
complete resume point (SURVEY §5): learner params, target params, opponent
snapshot, optimizer state and gradient-step counter.
"""

from __future__ import annotations

import json
import os

import orbax.checkpoint as ocp


def _manager(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save(directory: str, train_state, step: int) -> None:
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(train_state))
    mgr.wait_until_finished()
    mgr.close()


def restore(directory: str, template):
    """Restore the latest checkpoint into the shape of ``template``."""
    mgr = _manager(directory)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None, None
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored, step


def save_full(directory: str, train_state, env_state, buffer, key, step: int) -> None:
    """Full actor-learner resume point (SURVEY §5): learner/target/opponent
    params + optimizer, the batched env state, the replay ring buffer and
    the PRNG key — everything needed to continue bit-for-bit."""
    payload = {
        "train_state": train_state,
        "env_state": env_state,
        "buffer": buffer,
        "key": key,
    }
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def restore_full(directory: str, train_state, env_state, buffer, key):
    """Restore the latest full resume point into the given templates."""
    template = {
        "train_state": train_state,
        "env_state": env_state,
        "buffer": buffer,
        "key": key,
    }
    mgr = _manager(directory)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None, None
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored, step


def save_payload(directory: str, payload, step: int, meta: dict | None = None) -> None:
    """Generic full-resume save: any device pytree plus an optional
    JSON-able ``meta`` sidecar for host-side state that is not a pytree of
    arrays (e.g. a numpy Generator's bit-generator state, league pool
    length).  Used by the AZ/PPO full-resume paths (train/alphazero.py,
    train/ppo.py) — the working equivalent of the reference's restore
    sketch (/root/reference/gobblet_rl/examples/example_RLlib.py:93-108)."""
    mgr = _manager(directory)
    if meta is not None:
        # Written (atomically, tmp+rename) BEFORE the Orbax commit: a
        # preemption between the two leaves a meta file for a step that
        # latest_step() never reports — harmless — whereas the reverse
        # order left a restorable checkpoint whose host-side state (RNG,
        # pool length) was silently lost, breaking the bit-exact resume
        # guarantee (round-4 advisor finding).
        path = os.path.join(os.path.abspath(directory), f"meta-{step}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, path)
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str):
    """Latest saved step in ``directory`` or None (no checkpoint yet)."""
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def load_meta(directory: str, step: int) -> dict | None:
    path = os.path.join(os.path.abspath(directory), f"meta-{step}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def restore_payload(directory: str, template, step: int | None = None):
    """Restore the latest (or given) payload into ``template``'s structure;
    returns (payload, step) or (None, None) when nothing is saved."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None, None
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored, step


def save_params(path: str, params) -> None:
    """Standalone params dump (policy.pth equivalent)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(path: str, template):
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), template)
    ckptr.close()
    return out
