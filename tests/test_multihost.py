"""Multi-host (multi-process) distributed training.

Spawns real OS processes that each call ``jax.distributed.initialize`` on the
CPU backend (coordinator on localhost), build the global mesh spanning all
processes' devices, and run the shard_map DQN iteration — so the gradient
``pmean`` actually crosses a process boundary (Gloo transport), the same
topology a TPU pod slice has over ICI/DCN.  This covers the
SURVEY §5 distributed-backend mapping that replaces the reference's Ray
workers (/root/reference/gobblet_rl/examples/example_RLlib.py:44).
"""

import numpy as np
import pytest

from gobblet_rl_tpu.parallel.multihost import launch_local, pick_free_port


@pytest.mark.parametrize("num_processes,devices_per_process", [(2, 2)])
def test_multihost_dqn_iteration(num_processes, devices_per_process):
    results = launch_local(
        num_processes,
        devices_per_process,
        iterations=2,
        num_envs=8 * num_processes * devices_per_process,
        timeout=280.0,
    )
    assert len(results) == num_processes
    for r in results:
        # each worker saw the GLOBAL topology, not just its own devices
        assert r["processes"] == num_processes
        assert r["devices"] == num_processes * devices_per_process
        assert np.isfinite(r["loss"])
        assert r["grad_steps"] == 4  # 2 iterations x update_per_collect=2
    # pmean'd gradients -> byte-identical replicated params on every process
    assert len({r["digest"] for r in results}) == 1
    # and the replicated loss agrees everywhere
    assert len({r["loss"] for r in results}) == 1


@pytest.mark.parametrize("family", ["az", "ppo"])
def test_multihost_other_families(family):
    """AlphaZero and PPO run the same cross-process path."""
    results = launch_local(
        2, 2, iterations=1, num_envs=16, family=family, timeout=280.0
    )
    assert len(results) == 2
    assert all(r["family"] == family for r in results)
    assert all(np.isfinite(r["loss"]) for r in results)
    assert len({r["digest"] for r in results}) == 1


def test_init_distributed_noop_without_coordinator():
    """Single-host convenience: no coordinator -> no distributed runtime."""
    from gobblet_rl_tpu.parallel import mesh as mesh_mod

    mesh_mod.init_distributed()  # must not raise or initialize anything


def test_pick_free_port_is_bindable():
    import socket

    port = pick_free_port()
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("localhost", port))
