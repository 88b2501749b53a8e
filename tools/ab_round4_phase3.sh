#!/bin/bash
# Round-4 phase 3 (waits for the 8M trainer record run): refresh the HONEST
# single-chip scale table (CLAUDE.md) at the round-4 defaults (prng16 dropout
# draws + bf16 kernel MLPs) — device-timed 2M / 4M / 8M bench legs.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"

echo "=== waiting for 8M trainer record ($(date +%H:%M:%S)) ==="
while ! grep -q '^rc=' /tmp/r4_tpu8m_rec2.log 2>/dev/null; do sleep 60; done
echo "=== 8M record done ($(date +%H:%M:%S)) ==="

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  env "$@" BENCH_DEVICE_TIME=1 BENCH_EVAL=0 \
    timeout 5400 python bench.py > "/tmp/r4_${name}.log" 2>&1
  echo "rc=$? $(grep -o '"device_step_time_s": [0-9.]*\|"device_sps": [0-9.]*' \
    "/tmp/r4_${name}.log" | tr '\n' ' ')"
}

run scale_2m BENCH_NODES=2097152 BENCH_STEPS=4
run scale_4m BENCH_NODES=4194304 BENCH_STEPS=4
run scale_8m BENCH_NODES=8388608 BENCH_STEPS=4
echo "=== phase 3 done ($(date +%H:%M:%S)) ==="
