"""Headline benchmark: batched env throughput on one TPU chip.

Measures the lane-major fused rollout (random-admissible policy sampling +
legal mask + step + win detection + auto-reset under one lax.scan, zero host
round-trips) and compares against the reference implementation measured on
this machine (~265 env-steps/s single env over gobblet_v1.env(); BASELINE.md).

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import json
import sys
import time

import jax

# Persistent compilation cache: the TPU session in this environment pays a
# large one-time setup cost; cache compiled executables across runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Reference wrapped-env throughput measured on this host (BASELINE.md):
# random-admissible driver over gobblet_v1.env(), pettingzoo 1.26, numpy path.
REFERENCE_STEPS_PER_SEC = 265.0

BATCH = 524288
STEPS = 64
REPEATS = 3


def main() -> None:
    from gobblet_rl_tpu.ops import batched_core as bc

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    state = bc.reset_planes(BATCH)

    # compile + warmup
    out = bc.rollout_random(state, key, STEPS)
    jax.block_until_ready(out[2])

    best = 0.0
    for _ in range(REPEATS):
        state = bc.reset_planes(BATCH)
        t0 = time.perf_counter()
        state, key, stats = bc.rollout_random(state, key, STEPS)
        jax.block_until_ready(stats)
        dt = time.perf_counter() - t0
        best = max(best, BATCH * STEPS / dt)
        print(
            f"# {BATCH * STEPS} env-steps in {dt:.3f}s -> {BATCH * STEPS / dt:,.0f} steps/s"
            f" (episodes={int(stats['episodes'])})",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(best, 1),
                "unit": "steps/s",
                "vs_baseline": round(best / REFERENCE_STEPS_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
