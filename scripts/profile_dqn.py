"""Capture and summarize a REAL device profile of the fused DQN iteration.

Round-4 verdict item 5: the "latency-bound at small env counts" diagnosis
of the DQN train loop rested on one falsification (removing replay-ring
bytes moved nothing) but no observed trace.  This script runs the exact
bench configuration under ``jax.profiler.trace`` and reduces the captured
xplane to a per-HLO-op time table (top sinks, % of device time), printed
as markdown + JSON for docs/PROFILE.md.

Usage (TPU):
    python scripts/profile_dqn.py [--envs 262144] [--iters 3]
    python scripts/profile_dqn.py --family ppo --envs 8192
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys_path_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if sys_path_repo not in sys.path:
    sys.path.insert(0, sys_path_repo)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def build_dqn(envs: int, prng: str = "threefry2x32"):
    import optax

    from gobblet_rl_tpu.models.mlp import QNet
    from gobblet_rl_tpu.ops import batched_core as bc
    from gobblet_rl_tpu.train import dqn, replay

    config = dqn.DQNConfig(
        num_envs=envs,
        buffer_size=max(1 << 18, envs * 16),
        batch_size=min(4096, envs),
        segment_len=16,
        update_per_collect=8,
        opponent="random",
    )
    net = QNet(hidden_sizes=config.hidden_sizes)
    optimizer = optax.adam(config.lr)
    key = jax.random.key(0, impl=prng)
    ts = dqn.init_train_state(config, net, optimizer, jax.random.PRNGKey(0))
    env_state = bc.reset_planes(config.num_envs)
    buffer = replay.make_buffer(config.buffer_size)
    it, _ = dqn.make_train_iteration(config, net, optimizer)

    state = {"ts": ts, "env": env_state, "buf": buffer, "key": key}

    def step(state):
        ts, env, buf, key, loss = it(
            state["ts"], state["env"], state["buf"], state["key"]
        )
        return {"ts": ts, "env": env, "buf": buf, "key": key}, loss

    steps_per_iter = config.num_envs * (config.segment_len + config.n_step - 1)
    return state, step, steps_per_iter


def build_ppo(envs: int):
    from gobblet_rl_tpu.train import ppo as ppo_mod

    config = ppo_mod.PPOConfig(num_envs=envs, segment_len=32)
    net, opt, st = ppo_mod.init_ppo(config, jax.random.PRNGKey(0))
    it = ppo_mod.make_train_iteration(config, net, opt)
    state = {
        "p": st.params[0], "o": st.params[1], "s": st.opt_states[0],
        "e": st.env_states[0], "key": jax.random.PRNGKey(1),
    }

    def step(state):
        p, s, e, key, stats = it(
            state["p"], state["o"], state["s"], state["e"], state["key"], 0
        )
        return {"p": p, "o": state["o"], "s": s, "e": e, "key": key}, stats["loss"]

    return state, step, config.num_envs * config.segment_len


def build_az(envs: int):
    """Bench configuration of the fused AlphaZero (gumbel_lm) iteration."""
    from gobblet_rl_tpu.train import alphazero as az

    config = az.AZConfig(
        search="gumbel_lm", num_sims=32, num_envs=envs, segment_len=48,
        model="conv", batch_size=min(2048, envs * 48),
    )
    net, optimizer, st = az.init_alphazero(config, jax.random.PRNGKey(0))
    it = az.make_train_iteration(config, net, optimizer)
    state = {"p": st.params, "o": st.opt_state, "e": st.env_state,
             "key": jax.random.PRNGKey(1)}

    def step(state):
        p, o, e, stats = it(state["p"], state["o"], state["e"], state["key"])
        key = jax.random.fold_in(state["key"], 1)
        return {"p": p, "o": o, "e": e, "key": key}, stats["loss"]

    return state, step, config.num_envs * config.segment_len


def capture(state, step, logdir: str, iters: int):
    # compile + settle outside the trace
    for _ in range(2):
        state, loss = step(state)
        jax.block_until_ready(loss)
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            state, loss = step(state)
        jax.block_until_ready(loss)
    return state


def device_op_table(logdir: str):
    """Reduce the captured trace to per-op EXCLUSIVE device time.

    The profiler writes a Chrome-trace JSON next to the xplane; the TPU
    process exposes three device threads — ``Steps``, ``XLA Modules`` and
    ``XLA Ops`` — where the ops thread nests control-flow wrappers
    (``while.N``) around their body ops.  Exclusive time = an event's
    duration minus its nested children, computed with an interval stack,
    so the table sums to total device time with no double counting.

    Returns (op_table [(name, excl_us, calls)], module_table, step_durs_us).
    """
    import gzip

    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.trace.json.gz")
    ))
    assert paths, f"no trace.json.gz under {logdir}"
    rows, modules, steps = {}, {}, []
    for path in paths:
        with gzip.open(path) as f:
            data = json.load(f)
        ev = data["traceEvents"]
        # device process = the pid whose process_name mentions TPU/GPU
        dev_pids = {
            e["pid"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and ("TPU" in e["args"]["name"] or "GPU" in e["args"]["name"])
        }
        tname = {
            (e["pid"], e.get("tid")): e["args"]["name"]
            for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"
        }
        for pid in dev_pids:
            ops = sorted(
                (e for e in ev
                 if e.get("pid") == pid and e.get("ph") == "X"
                 and tname.get((pid, e.get("tid"))) == "XLA Ops"),
                key=lambda e: (e["ts"], -e.get("dur", 0)),
            )
            stack = []  # (end_ts, child_time_accum_index)
            child_time = []
            for e in ops:
                ts, dur = e["ts"], e.get("dur", 0)
                while stack and ts >= stack[-1][0] - 1e-9:
                    stack.pop()
                if stack:
                    child_time[stack[-1][1]] += dur
                child_time.append(0.0)
                stack.append((ts + dur, len(child_time) - 1))
                e["_ci"] = len(child_time) - 1
            for e in ops:
                excl = e.get("dur", 0) - child_time[e["_ci"]]
                agg = rows.setdefault(e["name"], [0.0, 0])
                agg[0] += excl
                agg[1] += 1
            for e in ev:
                if e.get("pid") != pid or e.get("ph") != "X":
                    continue
                tn = tname.get((pid, e.get("tid")))
                if tn == "XLA Modules":
                    agg = modules.setdefault(e["name"], [0.0, 0])
                    agg[0] += e.get("dur", 0)
                    agg[1] += 1
                elif tn == "Steps":
                    steps.append(e.get("dur", 0))
    table = sorted(
        ((name, us, n) for name, (us, n) in rows.items()),
        key=lambda r: -r[1],
    )
    module_table = sorted(
        ((name, us, n) for name, (us, n) in modules.items()),
        key=lambda r: -r[1],
    )
    return table, module_table, steps


def classify(name: str) -> str:
    n = name.lower()
    if n.startswith("while") or n.startswith("conditional"):
        return "control-flow(self)"
    if "rng" in n or "threefry" in n or "philox" in n:
        return "rng"
    if "dot" in n or n.startswith("conv"):
        return "matmul"
    if "copy" in n or "transpose" in n or "bitcast" in n or "reshape" in n:
        return "data-movement"
    if "sort" in n:
        return "sort"
    if "scatter" in n or "gather" in n or "dynamic-slice" in n or "dynamic-update" in n:
        return "gather-scatter"
    if "reduce" in n:
        return "reduce-fusion"
    if "fusion" in n:
        return "fusion"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="dqn", choices=["dqn", "ppo", "az"])
    p.add_argument("--envs", type=int, default=262144)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--logdir", default="")
    p.add_argument("--json-out", default="")
    p.add_argument("--prng", default="threefry2x32",
                   choices=["threefry2x32", "rbg"],
                   help="PRNG impl for the training key (rbg: hardware RNG, "
                        "measured +13%% on the DQN loop at 262k envs)")
    args = p.parse_args()

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    builders = {"dqn": lambda: build_dqn(args.envs, args.prng),
                "ppo": lambda: build_ppo(args.envs),
                "az": lambda: build_az(args.envs)}
    state, step, steps_per_iter = builders[args.family]()
    logdir = args.logdir or tempfile.mkdtemp(prefix=f"prof_{args.family}_")
    import time

    t0 = time.perf_counter()
    capture(state, step, logdir, args.iters)
    wall = time.perf_counter() - t0
    print(f"captured {args.iters} iterations in {wall:.3f}s -> {logdir}",
          file=sys.stderr, flush=True)

    table, module_table, steps = device_op_table(logdir)
    total_us = sum(us for _, us, _ in table)
    print(f"total device op time {total_us/1e3:.2f} ms over {args.iters} "
          f"iterations; modules: "
          + "; ".join(f"{n.split('(')[0]} {us/1e3:.2f}ms x{c}"
                      for n, us, c in module_table[:4]),
          file=sys.stderr, flush=True)

    print(f"\n| # | op | total ms | calls | % of device time | class |")
    print("|---|---|---|---|---|---|")
    out_rows = []
    for i, (name, us, n) in enumerate(table[: args.top], 1):
        frac = 100.0 * us / max(total_us, 1e-9)
        print(f"| {i} | `{name[:70]}` | {us/1e3:.3f} | {n} | {frac:.1f}% | "
              f"{classify(name)} |")
        out_rows.append({"op": name, "total_us": round(us, 1), "calls": n,
                         "pct": round(frac, 2), "class": classify(name)})

    by_class = {}
    for name, us, _ in table:
        by_class[classify(name)] = by_class.get(classify(name), 0.0) + us
    print("\nby class:")
    for cls, us in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"  {cls}: {us/1e3:.2f} ms ({100*us/max(total_us,1e-9):.1f}%)")

    summary = {
        "family": args.family,
        "prng": args.prng,
        "envs": args.envs,
        "iters": args.iters,
        "wall_s": round(wall, 3),
        "device_total_ms": round(total_us / 1e3, 3),
        "device_busy_frac_of_wall": round(total_us / 1e6 / wall, 4),
        "module_ms_per_iter": (
            round(module_table[0][1] / 1e3 / max(module_table[0][2], 1), 3)
            if module_table else None
        ),
        "env_steps_per_sec": round(args.iters * steps_per_iter / wall, 1),
        "by_class_ms": {k: round(v / 1e3, 3) for k, v in by_class.items()},
        "top": out_rows,
    }
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(summary, f, indent=2)
    print("\n" + json.dumps({k: v for k, v in summary.items() if k != "top"}))


if __name__ == "__main__":
    main()
