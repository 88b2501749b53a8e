#!/bin/bash
# Round-5 tunnel watcher: poll for axon recovery, then run the pending
# phase-2 on-chip queue (tools/ab_round5b.sh) ONCE. See tunnel_watch.sh
# (round-3 original) for the probe rationale. Unlike the round-3 outage the
# relay daemon (tpu_init) is still ALIVE this time, so the "no other python"
# guard must exclude it.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
others() {
  # python processes other than the relay daemon
  for p in $(pgrep -x python; pgrep -x python3); do
    [ "$p" != "$RELAY" ] && echo "$p"
  done
}
RELAY=$(ps -eo pid,cmd | awk '/tpu_init\.py/ && !/awk/ {print $1; exit}')
PROBE='import jax; d = jax.devices(); print("TUNNEL_OK", d)'
while true; do
  if timeout 75 python -c "$PROBE" 2>/dev/null | grep -q TUNNEL_OK; then
    while [ -n "$(others)" ]; do
      echo "tunnel healthy but another python process is running; waiting"
      sleep 120
    done
    echo "tunnel healthy at $(date); launching round-5 phase-2 queue"
    bash tools/ab_round5b.sh 2>&1 | tee /tmp/r5b_queue.log
    echo "queue done at $(date)"
    exit 0
  fi
  echo "tunnel still down at $(date)"
  sleep 600
done
