"""Multi-host (multi-process) training: the DCN story.

The reference's only cross-process execution is Ray rollout workers pickling
sample batches (/root/reference/gobblet_rl/examples/example_RLlib.py:44).
Here the equivalent is SPMD over a *global* mesh: every process calls
:func:`gobblet_rl_tpu.parallel.mesh.init_distributed` (a thin wrapper over
``jax.distributed.initialize``), the mesh spans all processes' devices, and
the same ``shard_map`` training step from parallel/sharded_train.py runs
unchanged — the gradient ``pmean`` now rides the cross-host transport
(Gloo on CPU, ICI/DCN collectives on a TPU pod slice).

``run_worker`` below is one process's whole life: initialize the distributed
runtime, place the globally-sharded train state, run N fused DQN iterations,
and report a digest that the launcher compares across processes (identical
digests prove the process-spanning gradient sync).  It is executed by

* ``python -m gobblet_rl_tpu.parallel.multihost --process-id I ...`` (one
  process of many, e.g. one per pod host), and
* :func:`launch_local` / ``__graft_entry__.dryrun_multihost`` / the
  tests/test_multihost.py suite, which spawn several such processes on
  localhost with virtual CPU devices.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import socket
import subprocess
import sys

import numpy as np


def pick_free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _params_digest(params) -> str:
    """Order-stable sha256 over all leaves of a replicated pytree."""
    import jax

    h = hashlib.sha256()
    leaves, _ = jax.tree.flatten(params)
    for leaf in leaves:
        h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
    return h.hexdigest()


def run_worker(
    coordinator: str,
    num_processes: int,
    process_id: int,
    *,
    iterations: int = 2,
    num_envs: int = 32,
    family: str = "dqn",
    emit=print,
) -> dict:
    """One process of a multi-host training run (``family``: dqn | az | ppo);
    returns (and emits as one JSON line)
    ``{"process_id", "loss", "digest", "devices", "processes", ...}``."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gobblet_rl_tpu.parallel import mesh as mesh_mod

    mesh_mod.init_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()

    from jax.sharding import NamedSharding, PartitionSpec as P

    from gobblet_rl_tpu.ops import batched_core as bc

    mesh = mesh_mod.make_mesh()
    n_dev = len(jax.devices())
    key = jax.random.PRNGKey(0)

    # Every process builds identical host values (same seed / zero init), so
    # placing them on global shardings is well-defined: replicated leaves are
    # asserted equal across processes by construction, sharded leaves donate
    # each process's slice.
    replicated = NamedSharding(mesh, P())

    def put_replicated(tree):
        return jax.tree.map(lambda x: jax.device_put(x, replicated), tree)

    if family == "dqn":
        import optax

        from gobblet_rl_tpu.parallel import sharded_train
        from gobblet_rl_tpu.train import dqn, replay

        config = dqn.DQNConfig(
            num_envs=num_envs,
            buffer_size=max(256, 8 * num_envs),
            batch_size=num_envs,
            segment_len=4,
            update_per_collect=2,
            opponent="random",
        )
        net = dqn.make_net(config)
        optimizer = optax.adam(config.lr)
        ts = put_replicated(dqn.init_train_state(config, net, optimizer, key))
        key = jax.device_put(key, replicated)
        env_state = mesh_mod.shard_env_state(
            bc.reset_planes(config.num_envs), mesh
        )
        buffer = jax.tree.map(
            lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
            replay.make_buffer(config.buffer_size),
            sharded_train._buffer_specs(replay.make_buffer(1)),
        )
        it, _ = sharded_train.make_sharded_train_iteration(
            config, net, optimizer, mesh
        )
        loss = None
        for i in range(iterations):
            ts, env_state, buffer, loss = it(
                ts, env_state, buffer, jax.random.fold_in(key, i)
            )
        params, extra = ts.params, {"grad_steps": int(ts.grad_steps)}
    elif family == "az":
        from gobblet_rl_tpu.parallel import sharded_alphazero
        from gobblet_rl_tpu.train import alphazero as az

        config = az.AZConfig(
            num_envs=num_envs, num_sims=4, segment_len=4, temp_moves=2,
            batch_size=num_envs, updates_per_iter=1,
            model="mlp", hidden_sizes=(16,),
        )
        net, optimizer, st = az.init_alphazero(config, key)
        params = put_replicated(st.params)
        opt_state = put_replicated(st.opt_state)
        key = jax.device_put(key, replicated)
        env_state = mesh_mod.shard_env_state(st.env_state, mesh)
        it = sharded_alphazero.make_sharded_az_iteration(
            config, net, optimizer, mesh
        )
        loss = None
        for i in range(iterations):
            params, opt_state, env_state, stats = it(
                params, opt_state, env_state, jax.random.fold_in(key, i)
            )
            loss = stats["loss"]
        extra = {}
    elif family == "ppo":
        from gobblet_rl_tpu.parallel import sharded_ppo
        from gobblet_rl_tpu.train import ppo as ppo_mod

        config = ppo_mod.PPOConfig(
            num_envs=num_envs, segment_len=4, minibatches=2,
            epochs_per_iter=1, hidden_sizes=(16,), model="mlp",
        )
        net, optimizer, st = ppo_mod.init_ppo(config, key)
        params = put_replicated(st.params[0])
        opp_params = put_replicated(st.params[1])
        opt_state = put_replicated(st.opt_states[0])
        key = jax.device_put(key, replicated)
        env_state = mesh_mod.shard_env_state(st.env_states[0], mesh)
        it = sharded_ppo.make_sharded_ppo_iteration(config, net, optimizer, mesh)
        loss = None
        for i in range(iterations):
            params, opt_state, env_state, stats = it(
                params, opp_params, opt_state, env_state,
                jax.random.fold_in(key, i), 0,
            )
            loss = stats["loss"]
        extra = {}
    else:
        raise ValueError(f"unknown family {family!r}")

    jax.block_until_ready(loss)
    result = {
        "process_id": process_id,
        "processes": int(jax.process_count()),
        "devices": n_dev,
        "family": family,
        "loss": float(loss),
        "digest": _params_digest(params),
        **extra,
    }
    emit(json.dumps(result), flush=True)
    return result


def launch_local(
    num_processes: int = 2,
    devices_per_process: int = 2,
    *,
    iterations: int = 2,
    num_envs: int = 32,
    family: str = "dqn",
    timeout: float = 300.0,
) -> list[dict]:
    """Spawn ``num_processes`` workers on localhost (virtual CPU devices),
    wait for all, and return their parsed result dicts (sorted by id).

    Raises if any worker fails or the param digests disagree — the digest
    equality is the proof that the gradient pmean spanned processes.
    """
    port = pick_free_port()
    env = {
        **os.environ,
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices_per_process}",
        "JAX_PLATFORMS": "cpu",
        "JAX_NUM_CPU_DEVICES": str(devices_per_process),
    }
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "gobblet_rl_tpu.parallel.multihost",
                "--coordinator", f"localhost:{port}",
                "--num-processes", str(num_processes),
                "--process-id", str(i),
                "--iterations", str(iterations),
                "--num-envs", str(num_envs),
                "--family", family,
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(num_processes)
    ]
    results = []
    errors = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            errors.append(f"worker rc={p.returncode}\n{err[-2000:]}")
            continue
        results.append(json.loads(out.strip().splitlines()[-1]))
    if errors:
        raise RuntimeError("multihost workers failed:\n" + "\n---\n".join(errors))
    results.sort(key=lambda r: r["process_id"])
    digests = {r["digest"] for r in results}
    if len(digests) != 1:
        raise RuntimeError(f"param digests diverged across processes: {results}")
    return results


def _main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator", required=True)
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--iterations", type=int, default=2)
    parser.add_argument("--num-envs", type=int, default=32)
    parser.add_argument("--family", type=str, default="dqn",
                        choices=["dqn", "az", "ppo"])
    args = parser.parse_args()
    run_worker(
        args.coordinator,
        args.num_processes,
        args.process_id,
        iterations=args.iterations,
        num_envs=args.num_envs,
        family=args.family,
    )


if __name__ == "__main__":
    _main()
