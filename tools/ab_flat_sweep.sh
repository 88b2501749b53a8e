#!/bin/bash
# Sequential device-timed A/B of the flat edge layout (run when the TPU
# tunnel is healthy). Each run: 6 steps, device-profiler timing, no eval on
# the A/B legs (eval only on the final candidate). Logs to /tmp/ab_*.log.
set -u
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  env "$@" BENCH_STEPS=6 BENCH_DEVICE_TIME=1 BENCH_EVAL=0 \
    timeout 3600 python bench.py > "/tmp/ab_${name}.log" 2>&1
  local rc=$?
  # with BENCH_DEVICE_TIME=1 the honest number is device_step_time_s /
  # device_sps (the profiler distorts wall-clock step_time_s — see bench.py)
  echo "rc=$rc $(grep -o '"device_step_time_s": [0-9.]*\|"device_sps": [0-9.]*' \
    "/tmp/ab_${name}.log" | tr '\n' ' ')"
}

# FIRST: the exact driver configuration (defaults, eval on, wall timing) —
# the single most important run if the tunnel window is short: it proves
# BENCH_r{N} reproducibility at HEAD and warms the compilation cache
echo "=== driver_default ($(date +%H:%M:%S)) ==="
timeout 3600 python bench.py > /tmp/ab_driver_default.log 2>&1
echo "rc=$? $(tail -1 /tmp/ab_driver_default.log | head -c 300)"

run baseline_slots BENCH_DEGREE_SECTIONS=0  # pin: AUTO (post round-5) enables sections on precomputed slots legs
run flat_src BENCH_EDGE_LAYOUT=flat
run flat_dst BENCH_EDGE_LAYOUT=flat BENCH_FLAT_ORDER=dst
# flat packs ~2.4 edges/node vs 8 slots/node, so the per-chunk edge-row count
# at chunk 64K is ~2.3x smaller than slotted; the chunk optimum may shift up
run flat_src_128k BENCH_EDGE_LAYOUT=flat BENCH_CHUNK=131072
run flat_dst_128k BENCH_EDGE_LAYOUT=flat BENCH_FLAT_ORDER=dst BENCH_CHUNK=131072

# Attention backward: split dq/dkv kernels vs the fused one (the fused bwd
# is the default under the 2MB q-block heuristic; the 10 bwd pallas_calls are
# 21% of total XLA-op time, so even a few % either way matters). One leg on
# the winner-so-far layout would be ideal, but layout isn't decided yet —
# measure on the driver-default slotted layout for a clean single-variable A/B
run attn_bwd_split BENCH_DEGREE_SECTIONS=0 GAOT_ATTN_BWD_FUSED=0

# INFERENCE legs (microbench says the optimum differs by direction: flat
# encoder + slotted decoder should win eval) — wall-timed eval, 2 steps of
# train just to reuse the program; inference_sps is the number to read
echo "=== eval legs (inference_sps; higher is better) ==="
# BENCH_DEGREE_SECTIONS=0 pins the slots leg to the UNIFORM layout: since
# round 5 bench AUTO-enables sections on precomputed slots legs, and the
# flat/mixed comparison legs cannot use sections — unpinned, this stops
# being a single-variable layout comparison
for leg in "eval_slots BENCH_DEGREE_SECTIONS=0" \
           "eval_flat BENCH_EDGE_LAYOUT=flat" \
           "eval_mixed BENCH_EDGE_LAYOUT=flat,slots"; do
  name="${leg%% *}"; envs="${leg#* }"
  echo "=== $name ($(date +%H:%M:%S)) ==="
  env $envs BENCH_STEPS=2 BENCH_EVAL=1 \
    timeout 3600 python bench.py > "/tmp/ab_${name}.log" 2>&1
  echo "rc=$? $(grep -o '"inference_sps": [0-9.]*' "/tmp/ab_${name}.log")"
done

echo "=== summary (device_step_time_s per leg; lower is better) ==="
for f in /tmp/ab_baseline_slots.log /tmp/ab_flat_src.log /tmp/ab_flat_dst.log \
         /tmp/ab_flat_src_128k.log /tmp/ab_flat_dst_128k.log; do
  [ -f "$f" ] || continue
  printf '%-24s %s\n' "$(basename "$f" .log)" \
    "$(grep -o '"device_step_time_s": [0-9.]*' "$f" | head -1)"
done
echo "=== done ==="
