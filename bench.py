"""Headline benchmark: batched env throughput + fused training loops, one TPU chip.

Measures
1. the lane-major fused rollout (random-admissible sampling + legal mask +
   step + win detection + auto-reset under one lax.scan, zero host
   round-trips),
2. the fused actor-learner iteration of every training family users run —
   DQN (train/dqn.py), AlphaZero (train/alphazero.py), PPO (train/ppo.py) —
   each as ONE XLA program per iteration, and
3. roofline accounting per program from XLA's compiled cost model: FLOP/s
   vs the chip's bf16 peak (MFU) and bytes/s vs HBM bandwidth.

Roofline reading (v5e, measured round 3): these are tiny-state RL programs,
not LLMs — the rollout does no matmuls at all (its ceiling is VPU
throughput on int8/bool lanes + the [54,B] random field), and the train
loops run MLPs of ~70k params over huge batches, so the env-stepping and
data-movement side dominates.  MFU is reported to make that explicit, not
because matmul peak is the right ceiling for every program.

Round-1 note on variance: single repeats showed a 3x outlier (191M/191M/64M
steps/s) because each repeat re-created and re-transferred the env state and
ran back-to-back with the remote-compile tunnel still settling.  Repeats now
reuse the on-device state chain (steady-state timing) and the reported value
is the MEDIAN of 5 repeats, with min/max printed for the spread.

Prints auxiliary JSON lines first and the headline metric as the FINAL line:
    {"metric": "env_steps_per_sec", "value": ..., "unit": ..., "vs_baseline": ...}

The reference baseline is measured on this host (BASELINE.md): 265 env
steps/s for the wrapped reference env under a random-admissible driver.
"""

from __future__ import annotations

import json
import os
import statistics
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

# TPU v5e (v5 lite) single-chip peaks: 197 TFLOP/s bf16 MXU, ~819 GB/s HBM.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES = 819e9

BATCH = int(os.environ.get("GOBBLET_BENCH_BATCH", str(524288)))
STEPS = int(os.environ.get("GOBBLET_BENCH_STEPS", "64"))
REPEATS = int(os.environ.get("GOBBLET_BENCH_REPEATS", "5"))
# Defaults sit at each family's measured throughput optimum from the
# round-4 env-count sweep (docs/sweeps/sweep_r4.jsonl; knees recorded in
# docs/RESULTS.md): DQN 262,144 envs, PPO 8,192, AZ 1,024.
TRAIN_ENVS = int(os.environ.get("GOBBLET_BENCH_TRAIN_ENVS", str(262144)))
# AZ search is ~num_sims x heavier per env-step than DQN/PPO; scale its env
# count (and the CPU smoke test's) independently of TRAIN_ENVS.
AZ_ENVS = int(os.environ.get("GOBBLET_BENCH_AZ_ENVS", "2048"))
AZ_SIMS = int(os.environ.get("GOBBLET_BENCH_AZ_SIMS", "32"))
AZ_SEGMENT = int(os.environ.get("GOBBLET_BENCH_AZ_SEGMENT", "48"))
# "gumbel_lm" (lane-major tree, search/gumbel_lm.py — 4.6x the vmapped
# batch-first tree at its own knee, measured round 4) | "gumbel" (vmapped)
AZ_SEARCH = os.environ.get("GOBBLET_BENCH_AZ_SEARCH", "gumbel_lm")
PPO_ENVS = int(os.environ.get("GOBBLET_BENCH_PPO_ENVS", "8192"))
PPO_SEGMENT = int(os.environ.get("GOBBLET_BENCH_PPO_SEGMENT", "32"))
# PRNG impl for the TRAIN-loop keys.  The round-5 device profile
# (docs/PROFILE.md) showed the two threefry+gumbel-argmax sampler fusions
# are the DQN collect scan's #1 sink (19.4% of device time); the hardware
# rbg generator lifts the 262k-env knee 62.7 -> 71.0M env-steps/s (+13%)
# with identical episode statistics.  Training itself defaults to threefry
# for cross-backend seed reproducibility — same split as the rollout bench.
TRAIN_PRNG = os.environ.get("GOBBLET_BENCH_TRAIN_PRNG", "rbg")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def xla_cost(jitted, *args, **kwargs):
    """(flops, bytes) per call from XLA's compiled cost model, or None if
    the backend does not expose cost analysis."""
    try:
        analysis = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):  # older jax: one per device
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)), float(
            analysis.get("bytes accessed", 0.0)
        )
    except Exception as e:  # axon remote backends may not expose it
        log(f"# cost_analysis unavailable: {type(e).__name__}: {e}")
        return None


def roofline(result: dict, cost, calls_per_sec: float) -> dict:
    """Attach MFU / HBM-utilization fields from an XLA cost estimate."""
    if cost is None:
        return result
    flops, nbytes = cost
    result["xla_flops_per_iter"] = round(flops)
    result["xla_bytes_per_iter"] = round(nbytes)
    result["tflops_per_sec"] = round(flops * calls_per_sec / 1e12, 3)
    result["mfu"] = round(flops * calls_per_sec / PEAK_BF16_FLOPS, 5)
    result["hbm_gbytes_per_sec"] = round(nbytes * calls_per_sec / 1e9, 1)
    result["hbm_util"] = round(nbytes * calls_per_sec / PEAK_HBM_BYTES, 4)
    return result


def bench_rollout() -> tuple:
    """Steady-state fused-rollout throughput; returns (median steps/s, aux)."""
    from gobblet_rl_tpu.ops import batched_core as bc

    # rbg PRNG: threefry spends most of the rollout's VPU time generating the
    # [54, B] random field; the TPU-native rbg generator is measured 18%
    # faster (222.8M vs 186.5M steps/s, v5e, B=512k — the ablation run in
    # docs/RESULTS.md; full-run median 218.1M) with identical episode
    # statistics.  unsafe_rbg was no faster and noisier (167-220M spread).
    key = jax.random.key(0, impl="rbg")
    state = bc.reset_planes(BATCH)

    # compile + settle: two untimed warmup runs on the same state chain
    for _ in range(2):
        state, key, stats = bc.rollout_random(state, key, STEPS)
        jax.block_until_ready(stats)

    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, key, stats = bc.rollout_random(state, key, STEPS)
        jax.block_until_ready(stats)
        dt = time.perf_counter() - t0
        rates.append(BATCH * STEPS / dt)
        log(
            f"# rollout: {BATCH * STEPS} env-steps in {dt:.3f}s -> "
            f"{rates[-1]:,.0f} steps/s (episodes={int(stats['episodes'])})"
        )
    med = statistics.median(rates)
    log(
        f"# rollout median {med:,.0f} steps/s over {REPEATS} repeats "
        f"(min {min(rates):,.0f}, max {max(rates):,.0f}, "
        f"spread {(max(rates) - min(rates)) / med:.1%})"
    )

    # per-call cost covers BATCH*STEPS env-steps; rescale to per-step
    cost = xla_cost(bc.rollout_random, state, key, STEPS)
    if cost is not None:
        flops, nbytes = cost
        per_step_bytes = nbytes / (BATCH * STEPS)
        aux = {
            "metric": "rollout_roofline",
            "bytes_per_env_step": round(per_step_bytes, 1),
            "flops_per_env_step": round(flops / (BATCH * STEPS), 1),
            "hbm_gbytes_per_sec": round(med * per_step_bytes / 1e9, 1),
            "hbm_util": round(med * per_step_bytes / PEAK_HBM_BYTES, 4),
            "tflops_per_sec": round(med * flops / (BATCH * STEPS) / 1e12, 3),
        }
        log(f"# rollout roofline: {aux['bytes_per_env_step']} B/step, "
            f"{aux['hbm_gbytes_per_sec']} GB/s ({aux['hbm_util']:.1%} of HBM), "
            f"{aux['tflops_per_sec']} TFLOP/s")
    else:
        aux = None
    return med, aux


def bench_dqn_train() -> dict:
    """Fused DQN actor-learner iteration throughput (the loop users run)."""
    import optax

    from gobblet_rl_tpu.models.mlp import QNet
    from gobblet_rl_tpu.ops import batched_core as bc
    from gobblet_rl_tpu.train import dqn, replay

    config = dqn.DQNConfig(
        num_envs=TRAIN_ENVS,
        buffer_size=max(1 << 18, TRAIN_ENVS * 16),
        batch_size=min(4096, TRAIN_ENVS),
        segment_len=16,
        update_per_collect=8,
        opponent="random",
    )
    net = QNet(hidden_sizes=config.hidden_sizes)
    optimizer = optax.adam(config.lr)
    key = jax.random.key(0, impl=TRAIN_PRNG)
    ts = dqn.init_train_state(config, net, optimizer, jax.random.PRNGKey(0))
    env_state = bc.reset_planes(config.num_envs)
    buffer = replay.make_buffer(config.buffer_size)
    it, _ = dqn.make_train_iteration(config, net, optimizer)

    cost = xla_cost(it, ts, env_state, buffer, key)

    # warmup (compile) + settle
    for _ in range(2):
        ts, env_state, buffer, key, loss = it(ts, env_state, buffer, key)
        jax.block_until_ready(loss)

    iters = 8
    env_steps_per_iter = config.num_envs * (config.segment_len + config.n_step - 1)
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, env_state, buffer, key, loss = it(ts, env_state, buffer, key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    result = {
        "metric": "dqn_train_env_steps_per_sec",
        "value": round(iters * env_steps_per_iter / dt, 1),
        "unit": "steps/s",
        "iterations_per_sec": round(iters / dt, 2),
        "grad_steps_per_sec": round(iters * config.update_per_collect / dt, 1),
        "num_envs": config.num_envs,
        "batch_size": config.batch_size,
    }
    result = roofline(result, cost, iters / dt)
    log(
        f"# dqn train: {iters} fused iterations in {dt:.3f}s -> "
        f"{result['iterations_per_sec']}/s, {result['value']:,.0f} env-steps/s, "
        f"{result['grad_steps_per_sec']} grad-steps/s, "
        f"mfu={result.get('mfu', 'n/a')}, hbm={result.get('hbm_util', 'n/a')}"
    )
    return result


def bench_az_train() -> dict:
    """Fused AlphaZero (Gumbel) self-play + update iteration (the zoo
    recipe's configuration, train/alphazero.py)."""
    from gobblet_rl_tpu.train import alphazero

    config = alphazero.AZConfig(
        search=AZ_SEARCH, num_sims=AZ_SIMS, num_envs=AZ_ENVS,
        segment_len=AZ_SEGMENT, model="conv",
        batch_size=min(2048, AZ_ENVS * AZ_SEGMENT),
    )
    key = jax.random.key(0, impl=TRAIN_PRNG)
    net, optimizer, st = alphazero.init_alphazero(config, jax.random.PRNGKey(0))
    it = alphazero.make_train_iteration(config, net, optimizer)

    cost = xla_cost(it, st.params, st.opt_state, st.env_state, key)

    params, opt_state, env_state = st.params, st.opt_state, st.env_state
    for _ in range(2):
        params, opt_state, env_state, stats = it(params, opt_state, env_state, key)
        jax.block_until_ready(stats["loss"])

    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, env_state, stats = it(params, opt_state, env_state, key)
    jax.block_until_ready(stats["loss"])
    dt = time.perf_counter() - t0
    moves_per_iter = config.num_envs * config.segment_len
    result = {
        "metric": "az_train_env_steps_per_sec",
        "value": round(iters * moves_per_iter / dt, 1),
        "unit": "steps/s",
        "iterations_per_sec": round(iters / dt, 2),
        "sims_per_sec": round(iters * moves_per_iter * config.num_sims / dt, 1),
        "num_envs": config.num_envs,
        "num_sims": config.num_sims,
        "search": AZ_SEARCH,
    }
    result = roofline(result, cost, iters / dt)
    log(
        f"# az train: {iters} iterations in {dt:.3f}s -> "
        f"{result['iterations_per_sec']}/s, {result['value']:,.0f} moves/s, "
        f"{result['sims_per_sec']:,.0f} sims/s, "
        f"mfu={result.get('mfu', 'n/a')}, hbm={result.get('hbm_util', 'n/a')}"
    )
    return result


def bench_ppo_train() -> dict:
    """Fused PPO rollout + GAE + minibatch-epochs iteration (the zoo
    recipe's league configuration, train/ppo.py)."""
    from gobblet_rl_tpu.train import ppo

    config = ppo.PPOConfig(
        num_envs=PPO_ENVS, segment_len=PPO_SEGMENT, shared_policy=True,
        learner_player="both", opponent="self",
    )
    net, optimizer, st = ppo.init_ppo(config, jax.random.PRNGKey(0))
    key = jax.random.key(0, impl=TRAIN_PRNG)
    it = ppo.make_train_iteration(config, net, optimizer, "self")

    params, opt_state, env_state = st.params[0], st.opt_states[0], st.env_states[0]
    cost = xla_cost(it, params, params, opt_state, env_state, key, "both")

    for _ in range(2):
        params, opt_state, env_state, key, stats = it(
            params, params, opt_state, env_state, key, "both"
        )
        jax.block_until_ready(stats["loss"])

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, env_state, key, stats = it(
            params, params, opt_state, env_state, key, "both"
        )
    jax.block_until_ready(stats["loss"])
    dt = time.perf_counter() - t0
    steps_per_iter = config.num_envs * config.segment_len
    grad_steps = config.epochs_per_iter * config.minibatches
    result = {
        "metric": "ppo_train_env_steps_per_sec",
        "value": round(iters * steps_per_iter / dt, 1),
        "unit": "steps/s",
        "iterations_per_sec": round(iters / dt, 2),
        "grad_steps_per_sec": round(iters * grad_steps / dt, 1),
        "num_envs": config.num_envs,
    }
    result = roofline(result, cost, iters / dt)
    log(
        f"# ppo train: {iters} iterations in {dt:.3f}s -> "
        f"{result['iterations_per_sec']}/s, {result['value']:,.0f} env-steps/s, "
        f"mfu={result.get('mfu', 'n/a')}, hbm={result.get('hbm_util', 'n/a')}"
    )
    return result


def main() -> None:
    dev = jax.devices()[0]
    log(f"# device: {dev.platform} {dev.device_kind}")

    # GOBBLET_BENCH_ONLY=dqn,ppo runs a subset (config sweeps); the default
    # (unset) runs everything with the headline metric LAST — the contract
    # the driver's tail-line parser relies on
    only = set(filter(None, os.environ.get("GOBBLET_BENCH_ONLY", "").split(",")))

    def want(section: str) -> bool:
        return not only or section in only

    # auxiliary metrics first; headline LAST so line-based parsers get it
    if want("dqn"):
        print(json.dumps(bench_dqn_train()))
    if want("az"):
        print(json.dumps(bench_az_train()))
    if want("ppo"):
        print(json.dumps(bench_ppo_train()))
    if want("rollout"):
        median_rate, rollout_aux = bench_rollout()
        if rollout_aux is not None:
            print(json.dumps(rollout_aux))
        print(
            json.dumps(
                {
                    "metric": "env_steps_per_sec",
                    "value": round(median_rate, 1),
                    "unit": "steps/s",
                    "vs_baseline": round(median_rate / REFERENCE_STEPS_PER_SEC, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
