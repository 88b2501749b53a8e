#!/bin/bash
# Round-5 phase-2 on-chip queue: sections are now the bench DEFAULT (AUTO).
#   1. driver-default bench (what BENCH_r05.json will capture): full checks
#      + eval, sections auto-on
#   2. exported-serving timing (VERDICT item 5) -> SERVING.md numbers
#   3. sections scale legs 4M / 8M (refresh the scale table; 2M/500K done)
# Logs to /tmp/r5b_*.log. One TPU process at a time (they serialize).
set -u
cd "$(dirname "$0")/.."

echo "=== driver_default_sections ($(date +%H:%M:%S)) ==="
timeout 7200 python bench.py > /tmp/r5b_driver_default.log 2>&1
echo "rc=$? $(tail -1 /tmp/r5b_driver_default.log | head -c 400)"

echo "=== time_serving ($(date +%H:%M:%S)) ==="
timeout 7200 python tools/time_serving.py > /tmp/r5b_serving.log 2>&1
echo "rc=$? $(tail -3 /tmp/r5b_serving.log | head -c 400)"

for leg in "sections_4m 4194304" "sections_8m 8388608"; do
  name="${leg%% *}"; nodes="${leg#* }"
  echo "=== $name ($(date +%H:%M:%S)) ==="
  env BENCH_NODES=$nodes BENCH_STEPS=4 BENCH_DEVICE_TIME=1 BENCH_EVAL=0 \
    timeout 7200 python bench.py > "/tmp/r5b_${name}.log" 2>&1
  echo "rc=$? $(grep -o '"device_step_time_s": [0-9.]*\|"device_sps": [0-9.]*' \
    "/tmp/r5b_${name}.log" | tr '\n' ' ')"
done

echo "=== summary ==="
for f in /tmp/r5b_*.log; do
  printf '%-28s %s %s\n' "$(basename "$f" .log)" \
    "$(grep -o '"device_step_time_s": [0-9.]*' "$f" | head -1)" \
    "$(grep -o '"inference_sps": [0-9.]*' "$f" | head -1)"
done
