#!/bin/bash
# Round-5 sequential on-chip queue (run when the TPU tunnel is healthy).
# Order: most-valuable-first in case the tunnel window is short.
#   1. driver-default bench at HEAD (reproducibility + cache warm)
#   2. degree-sectioned layout A/B at 500K (VERDICT item 1: adopt or kill)
#   3. inference regression bisect (VERDICT item 4): eval with f32 kernel
#      MLPs (the round-4 default flip to bf16 is the prime suspect)
#   4. degree-sectioned at 2M
# Logs to /tmp/r5_*.log. Device-timed legs: read device_step_time_s.
set -u
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  env "$@" BENCH_STEPS=6 BENCH_DEVICE_TIME=1 BENCH_EVAL=0 \
    timeout 5400 python bench.py > "/tmp/r5_${name}.log" 2>&1
  echo "rc=$? $(grep -o '"device_step_time_s": [0-9.]*\|"device_sps": [0-9.]*' \
    "/tmp/r5_${name}.log" | tr '\n' ' ')"
}

echo "=== driver_default ($(date +%H:%M:%S)) ==="
timeout 5400 python bench.py > /tmp/r5_driver_default.log 2>&1
echo "rc=$? $(tail -1 /tmp/r5_driver_default.log | head -c 300)"

run baseline_slots_500k BENCH_DEGREE_SECTIONS=0  # pin: AUTO now enables sections
run sections_500k BENCH_DEGREE_SECTIONS=1

# Inference bisect: eval-only wall timing (inference_sps), 2 train steps to
# reuse the program. bf16 kernel MLPs became the default in round 4 — the
# only model-math change that also runs at eval time.
for leg in "eval_bf16 " "eval_f32 BENCH_KERNEL_DTYPE=float32"; do
  name="${leg%% *}"; envs="${leg#* }"
  echo "=== $name ($(date +%H:%M:%S)) ==="
  env $envs BENCH_STEPS=2 BENCH_EVAL=1 \
    timeout 5400 python bench.py > "/tmp/r5_${name}.log" 2>&1
  echo "rc=$? $(grep -o '"inference_sps": [0-9.]*' "/tmp/r5_${name}.log")"
done

run baseline_slots_2m BENCH_DEGREE_SECTIONS=0 BENCH_NODES=2097152
run sections_2m BENCH_DEGREE_SECTIONS=1 BENCH_NODES=2097152

echo "=== summary ==="
for f in /tmp/r5_*.log; do
  printf '%-28s %s %s\n' "$(basename "$f" .log)" \
    "$(grep -o '"device_step_time_s": [0-9.]*' "$f" | head -1)" \
    "$(grep -o '"inference_sps": [0-9.]*' "$f" | head -1)"
done
