#!/bin/bash
# Reference ground-truth runs for the ablation-config parity comparison
# (VERDICT r1 item 6): sweep case 2 (edges-only) and the two implicit-mask
# configs, each with MARF_DUMP_INIT so marf_tpu can be run from the SAME
# initial parameters (same-init transplant, PARITY.md).
#
# The implicit cases run with use_masks=True: the reference computes
# Mask_Error unconditionally from images.masks whenever use_implicit_mask
# (reference model/planar.py:238-242), so use_masks=False + implicit would
# crash it at the first scalar log — use_masks only feeds the metric here;
# the loss still uses the predicted masks (model/planar.py:361-370).
#
# Runs sequentially (single CPU); ~3-4 h total. Usage:
#   nohup bash tools/parity_cases.sh > /tmp/parity_cases.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  local name=$1 iters=$2; shift 2
  echo "=== reference case $name ($iters iters) $(date) ==="
  MARF_DUMP_INIT=/tmp/torch_init_${name}.npz bash tools/run_reference.sh /tmp/refrun \
    --group=parity2 --model=planar --yaml=planar --name="$name" --seed=3 \
    --barf_c2f=[0,0.4] --max_iter="$iters" "$@" \
    || echo "case $name FAILED (rc=$?)"
}

run caseA 600 --use_masks! --use_edges --alpha_initial=1 --alpha_final=1
run caseB 400 --use_masks --use_implicit_mask --use_edges!
run caseC 400 --use_masks --use_implicit_mask --use_edges --alpha_initial=0 --alpha_final=1
echo "=== all reference cases done $(date) ==="
