#!/bin/bash
# Round-4 phase 4 (waits for the phase-3 scale legs): rerun the 8M
# precomputed-pipeline trainer record (VERDICT r3 item 8) with the
# host-staged-assembly fix — BatchLoader(host_arrays=True) keeps batches on
# HOST until the step's single entry-layout put, enc/dec slot aliasing halves
# slot HBM, and train_step harvests layouts BEFORE any device placement.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"

echo "=== waiting for phase 3 ($(date +%H:%M:%S)) ==="
while ! grep -q 'phase 3 done' /tmp/r4_queue3.log 2>/dev/null; do sleep 60; done

echo "=== 8M trainer record rerun ($(date +%H:%M:%S)) ==="
timeout 5400 python main.py --config configs/examples/synthetic/tpu_8m.yaml \
  > /tmp/r4_tpu8m_rec3.log 2>&1
echo "rc=$?"
grep -E "loader:|compiled step memory|train .*val |throughput|samples/s" /tmp/r4_tpu8m_rec3.log | tail -12
echo "=== phase 4 done ($(date +%H:%M:%S)) ==="

echo "=== vpu bf16 packing probe ($(date +%H:%M:%S)) ==="
timeout 1800 python tools/microbench_vpu_bf16.py > /tmp/mb_vpu_bf16.log 2>&1
echo "rc=$?"; cat /tmp/mb_vpu_bf16.log
echo "=== phase 4 fully done ($(date +%H:%M:%S)) ==="
