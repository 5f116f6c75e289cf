"""Orbax checkpointing of the full training state.

Replaces the reference's ``torch.save(state_dict)`` best-model dump
(/root/reference/gobblet_rl/examples/example_tianshou_DQN.py:418-428) with a
complete resume point (SURVEY §5): learner params, target params, opponent
snapshot, optimizer state and gradient-step counter.
"""

from __future__ import annotations

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
