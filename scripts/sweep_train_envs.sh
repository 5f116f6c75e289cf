#!/bin/bash
# Train-loop batch-size sweep on the real TPU chip: runs each bench.py
# family section (GOBBLET_BENCH_ONLY) across env counts to find the
# throughput-optimal configuration.  Serial by design — ONE TPU process at
# a time (see CLAUDE.md).  Usage: scripts/sweep_train_envs.sh [out.jsonl]
set -u
OUT=${1:-/tmp/sweep_train.jsonl}
: > "$OUT"

run() {  # run <section> <extra env as K=V...>
  local section=$1; shift
  echo "### $section $*" >&2
  env "$@" GOBBLET_BENCH_ONLY="$section" timeout 1800 python bench.py \
    2>>"${OUT%.jsonl}.log" | while read -r line; do
      # bench.py prints one JSON object per line; anything else (a crash
      # traceback fragment, a stray print) must not silently corrupt OUT
      if [[ $line == {* ]]; then
        echo "{\"config\": \"$*\", ${line#\{}"
      else
        echo "WARN: non-JSON bench output dropped: $line" >&2
      fi
    done >> "$OUT"
  local status=${PIPESTATUS[0]}
  if [[ $status -ne 0 ]]; then
    echo "WARN: section '$section $*' exited $status (see ${OUT%.jsonl}.log)" >&2
    echo "{\"config\": \"$*\", \"metric\": \"${section}_FAILED\", \"exit\": $status}" >> "$OUT"
  fi
}

run dqn GOBBLET_BENCH_TRAIN_ENVS=16384
run dqn GOBBLET_BENCH_TRAIN_ENVS=32768
run dqn GOBBLET_BENCH_TRAIN_ENVS=65536
run dqn GOBBLET_BENCH_TRAIN_ENVS=131072

run ppo GOBBLET_BENCH_PPO_ENVS=2048
run ppo GOBBLET_BENCH_PPO_ENVS=4096
run ppo GOBBLET_BENCH_PPO_ENVS=8192
run ppo GOBBLET_BENCH_PPO_ENVS=16384

# AZ legs run the shipped default search (gumbel_lm since round 4; set
# GOBBLET_BENCH_AZ_SEARCH=gumbel to sweep the vmapped tree). Measured
# knees: gumbel_lm 2,048 envs (188k moves/s), vmapped 1,024 (41k).
run az GOBBLET_BENCH_AZ_ENVS=512
run az GOBBLET_BENCH_AZ_ENVS=1024
run az GOBBLET_BENCH_AZ_ENVS=2048
run az GOBBLET_BENCH_AZ_ENVS=4096
run az GOBBLET_BENCH_AZ_ENVS=8192

cat "$OUT"
