#!/bin/bash
# Watch for the axon TPU tunnel to come back, then run the pending on-chip
# A/B sweep (tools/ab_flat_sweep.sh). The tunnel outage of 2026-08-17 killed
# the relay daemon; it can only be restored externally, so we poll.
#
# Probe = `jax.devices()` bounded at 75s in a subprocess (a healthy tunnel
# answers in <45s; CLAUDE.md). On success runs the sweep ONCE and exits.
set -u
cd "$(dirname "$0")/.."
PROBE='import jax; d = jax.devices(); print("TUNNEL_OK", d)'
while true; do
  if timeout 75 python -c "$PROBE" 2>/dev/null | grep -q TUNNEL_OK; then
    # single-TPU-process rule (CLAUDE.md): two TPU processes silently
    # serialize and corrupt every device-timed number. -x (exact name, no
    # -f) cannot match this script's own command line.
    while pgrep -x python >/dev/null || pgrep -x python3 >/dev/null; do
      echo "tunnel healthy but another python process is running; waiting"
      sleep 120
    done
    echo "tunnel healthy at $(date); launching A/B sweep"
    bash tools/ab_flat_sweep.sh 2>&1 | tee /tmp/ab_sweep_run.log
    echo "sweep done at $(date)"
    exit 0
  fi
  echo "tunnel still down at $(date)"
  sleep 600
done
