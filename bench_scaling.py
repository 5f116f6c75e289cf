"""Weak-scaling harness: fused-rollout env-steps/s vs mesh size.

Holds the PER-DEVICE env batch constant and grows the mesh (1, 2, 4, 8
devices), so ideal scaling is a flat per-device rate / linear total rate.
On this host it runs on virtual CPU devices (the process re-execs itself
with ``--xla_force_host_platform_device_count``) to validate the sharded
data path end-to-end; on a real pod slice the same script runs unchanged on
the TPU mesh (drop GOBBLET_SCALING_FORCE_CPU).

Prints one JSON line per mesh size plus a final summary line:
    {"metric": "weak_scaling_efficiency", "value": ..., ...}
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

MAX_DEVICES = int(os.environ.get("GOBBLET_SCALING_MAX_DEVICES", "8"))
PER_DEVICE_BATCH = int(os.environ.get("GOBBLET_SCALING_BATCH", "16384"))
STEPS = int(os.environ.get("GOBBLET_SCALING_STEPS", "32"))
REPEATS = int(os.environ.get("GOBBLET_SCALING_REPEATS", "3"))
FORCE_CPU = os.environ.get("GOBBLET_SCALING_FORCE_CPU", "1") == "1"


def _ensure_devices() -> None:
    """Re-exec with enough virtual CPU devices when forcing the CPU mesh."""
    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
    if m and int(m.group(1)) >= MAX_DEVICES:
        return
    new = f"--xla_force_host_platform_device_count={MAX_DEVICES}"
    flags = flags.replace(m.group(0), new) if m else (flags + " " + new).strip()
    os.environ["XLA_FLAGS"] = flags
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main() -> None:
    if FORCE_CPU:
        _ensure_devices()
    import jax

    if FORCE_CPU:
        jax.config.update("jax_platforms", "cpu")

    from gobblet_rl_tpu.ops import batched_core as bc
    from gobblet_rl_tpu.parallel import mesh as mesh_mod

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= min(MAX_DEVICES, n_avail)]
    platform = jax.devices()[0].platform
    print(f"# devices available: {n_avail} ({platform})", file=sys.stderr)
    if platform == "cpu":
        print(
            "# NOTE: virtual CPU devices share the same host cores — "
            "sub-linear 'scaling' here is expected; this validates the "
            "sharded data path, real efficiency needs real chips.",
            file=sys.stderr,
        )

    rates = {}
    for n in sizes:
        mesh = mesh_mod.make_mesh(n)
        batch = PER_DEVICE_BATCH * n
        state = mesh_mod.shard_env_state(bc.reset_planes(batch), mesh)
        key = jax.random.PRNGKey(0)
        # warmup/compile on this shape
        state, key, stats = bc.rollout_random(state, key, STEPS)
        jax.block_until_ready(stats)
        reps = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            state, key, stats = bc.rollout_random(state, key, STEPS)
            jax.block_until_ready(stats)
            reps.append(batch * STEPS / (time.perf_counter() - t0))
        rate = statistics.median(reps)
        rates[n] = rate
        print(json.dumps({
            "metric": "weak_scaling_env_steps_per_sec",
            "devices": n,
            "batch": batch,
            "value": round(rate, 1),
            "per_device": round(rate / n, 1),
            "unit": "steps/s",
        }))

    base = rates[sizes[0]]
    largest = sizes[-1]
    efficiency = rates[largest] / (base * largest)
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": f"fraction of linear at {largest} devices",
        "devices": largest,
        "per_device_batch": PER_DEVICE_BATCH,
    }))


if __name__ == "__main__":
    main()
