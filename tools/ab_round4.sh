#!/bin/bash
# Round-4 on-chip queue (sequential — ONE TPU process at a time):
#   1. driver_default  — exact driver bench at HEAD (validates the new
#      defaults: prng16 dropout draws ON + bfloat16 kernel MLPs; warms the
#      compile cache; reproduces the headline number)
#   2. payload_flat    — VERDICT r3 item 3: [B,n*K,d] 2D chunk bodies in the
#      fused encoder + decoder, killing the mid-scan [n,K,C]<->[n*K,C]
#      relayouts the per-HLO profile attributed ~9.5% of device time to
#   3. flat_dst_pallas — VERDICT r3 item 7: flat dst-sorted edge lists
#      reduced by the Pallas sorted-segment-sum (one-hot MXU accumulation),
#      end-to-end vs the slotted scatter baseline
#   4. tpu_8m trainer  — VERDICT r3 item 8: full main.py fit() at 8M nodes
#      over the precomputed .gsb mmap loader; per-epoch loader-stall
#      accounting proves the pipeline sustains the device step rate
# Logs to /tmp/r4_*.log. Device-timed legs: read device_step_time_s.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  env "$@" BENCH_STEPS=6 BENCH_DEVICE_TIME=1 BENCH_EVAL=0 \
    timeout 3600 python bench.py > "/tmp/r4_${name}.log" 2>&1
  echo "rc=$? $(grep -o '"device_step_time_s": [0-9.]*\|"device_sps": [0-9.]*' \
    "/tmp/r4_${name}.log" | tr '\n' ' ')"
}

echo "=== driver_default ($(date +%H:%M:%S)) ==="
timeout 5400 python bench.py > /tmp/r4_driver_default.log 2>&1
echo "rc=$? $(tail -1 /tmp/r4_driver_default.log | head -c 400)"

run payload_flat BENCH_PAYLOAD_LAYOUT=flat
run flat_dst_pallas BENCH_EDGE_LAYOUT=flat BENCH_FLAT_ORDER=dst BENCH_FLAT_REDUCE=pallas

echo "=== tpu_8m trainer ($(date +%H:%M:%S)) ==="
timeout 10800 python main.py --config configs/examples/synthetic/tpu_8m.yaml \
  > /tmp/r4_tpu8m.log 2>&1
echo "rc=$? (see /tmp/r4_tpu8m.log)"

echo "=== summary ==="
for f in /tmp/r4_driver_default.log /tmp/r4_payload_flat.log \
         /tmp/r4_flat_dst_pallas.log; do
  [ -f "$f" ] || continue
  printf '%-22s %s\n' "$(basename "$f" .log)" \
    "$(grep -o '"device_step_time_s": [0-9.]*\|"value": [0-9.]*' "$f" | head -2 | tr '\n' ' ')"
done
grep -E "loader_stall|epoch .*: train" /tmp/r4_tpu8m.log | tail -10
echo "=== done ($(date +%H:%M:%S)) ==="
