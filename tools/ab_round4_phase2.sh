#!/bin/bash
# Round-4 phase 2 (waits for tools/ab_round4.sh to finish):
#   1. baseline_prof — device-timed + traced baseline at HEAD defaults:
#      the apples-to-apples twin of the payload_flat device number AND the
#      relayout-share trace (VERDICT r3 item 3 done-criteria needs the
#      reshape+copy+broadcast share, tools/analyze_trace.py)
#   2. payflat_prof — same, with BENCH_PAYLOAD_LAYOUT=flat (compile cached
#      from phase-1 leg 2)
#   3. tpu_8m re-run — the loader-stall record with the new per-epoch
#      accounting log lines (compile cache warm from the phase-1 run)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"

echo "=== waiting for phase 1 ($(date +%H:%M:%S)) ==="
while ! grep -q "^=== done" /tmp/r4_queue.log 2>/dev/null; do sleep 60; done
echo "=== phase 1 done ($(date +%H:%M:%S)) ==="

run_prof() {
  local name="$1" dir="$2"; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  rm -rf "$dir"
  env "$@" BENCH_PROFILE="$dir" BENCH_DEVICE_TIME=1 BENCH_STEPS=3 BENCH_EVAL=0 \
    timeout 3600 python bench.py > "/tmp/r4_${name}.log" 2>&1
  echo "rc=$? $(grep -o '"device_step_time_s": [0-9.]*\|"device_sps": [0-9.]*' \
    "/tmp/r4_${name}.log" | tr '\n' ' ')"
  timeout 600 python tools/analyze_trace.py "$dir" 40 \
    > "/tmp/r4_${name}_trace.txt" 2>&1
  echo "trace -> /tmp/r4_${name}_trace.txt"
}

run_prof baseline_prof /tmp/prof_r4_base
run_prof payflat_prof /tmp/prof_r4_flat BENCH_PAYLOAD_LAYOUT=flat

echo "=== tpu_8m loader record ($(date +%H:%M:%S)) ==="
timeout 10800 python main.py --config configs/examples/synthetic/tpu_8m.yaml \
  > /tmp/r4_tpu8m_rec.log 2>&1
echo "rc=$?"
grep -E "loader:|epoch .*: train|Throughput|throughput" /tmp/r4_tpu8m_rec.log | tail -12
echo "=== phase 2 done ($(date +%H:%M:%S)) ==="
