#!/bin/bash
# TPU tunnel watcher (round-4 outage insurance). Probes every 5 min; when
# the tunnel returns it runs the staged measurement sweep (tools/tpu_sweep.sh)
# exactly once and auto-harvests the results:
#
#   python tools/harvest_sweep.py --apply
#
# --apply is safe unattended by construction: it writes
# marf_tpu/hw_validation.json ONLY if the dedup-forced implicit600 run held
# its golden, and records canonical@600/noposenc@600 goldens ONLY if absent
# (existing goldens are never overwritten). The dry-run table lands in
# /tmp/tpu_harvest.txt for review; PERF.md gets the table manually.
#
# Respects /tmp/tpu_lock (manual TPU work in flight — create it before any
# hand-run TPU job, per the one-TPU-process rule in CLAUDE.md).
#
# Start:  nohup bash tools/tpu_watch.sh & echo $! > /tmp/tpu_watch.pid
# Status: cat /tmp/tpu_status
set -u
cd "$(dirname "$0")/.."
while true; do
  if [ ! -e /tmp/tpu_lock ] && timeout 60 python -c "import jax; jax.devices()" 2>/dev/null; then
    echo "TUNNEL BACK $(date -u)" > /tmp/tpu_status
    touch /tmp/tpu_lock
    bash tools/tpu_sweep.sh
    python tools/harvest_sweep.py /tmp/tpu_sweep.jsonl --apply \
      > /tmp/tpu_harvest.txt 2>&1
    rm -f /tmp/tpu_lock
    echo "SWEEP+HARVEST DONE $(date -u)" >> /tmp/tpu_status
    exit 0
  fi
  echo "down $(date -u)" > /tmp/tpu_status
  sleep 300
done
