#!/bin/bash
# Round-5 (VERDICT r4 item 1): measure the UNMODIFIED reference's
# implicit-mask optimization rate on this machine (CPU torch), same method
# as the canonical 0.19 it/s row (PARITY.md): wall-clock between TensorBoard
# scalar-event timestamps over a steady window (tools/ref_rate_report.py).
#
# use_masks stays True: the reference's log_scalars computes Mask_Error from
# images.masks unconditionally whenever use_implicit_mask (reference
# model/planar.py:238-242) and would crash on masks=None — the premade masks
# feed only that metric; the training loss uses the predicted masks
# (reference model/planar.py:361-370), so the measured per-iteration work is
# the bench `implicit`/`implicit_single` workload.
#
# Usage: nohup bash tools/ref_rate.sh > /tmp/ref_rate.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  local name=$1 iters=$2 bound=$3; shift 3
  echo "=== ref rate: $name ($iters iters, bound ${bound}s) $(date) ==="
  timeout "$bound" bash tools/run_reference.sh /tmp/refrate \
    --group=rate --model=planar --yaml=planar --name="$name" --seed=3 \
    --barf_c2f=[0,0.4] --max_iter="$iters" "$@" \
    || echo "$name ended rc=$? (timeout ok — rate comes from TB timestamps)"
}

run implicit 200 6600 --use_masks --use_implicit_mask
run implicit_single 200 6600 --use_masks --use_implicit_mask --build_single_masks
echo "=== ref rate runs done $(date) ==="
