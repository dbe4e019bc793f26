#!/bin/bash
# marf_tpu side of the ablation-config same-init parity comparison
# (VERDICT r1 item 6). Run AFTER tools/parity_cases.sh completes: each case
# trains from the reference's dumped initial parameters
# (--load_torch_init), with true-f32 matmuls to match CPU torch, then diffs
# the TensorBoard curves at aligned steps.
#
# Usage: bash tools/parity_marf.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export MARF_YES=1
export JAX_DEFAULT_MATMUL_PRECISION=highest

run() {
  local name=$1 iters=$2; shift 2
  if [ ! -f "/tmp/torch_init_${name}.npz" ]; then
    echo "!! /tmp/torch_init_${name}.npz missing (reference run not done?) — skipping $name"
    return
  fi
  echo "=== marf case $name ($iters iters) $(date) ==="
  python train.py --group=parity2 --model=planar --yaml=planar --name="$name" \
    --seed=3 --barf_c2f=[0,0.4] --max_iter="$iters" \
    --load_torch_init="/tmp/torch_init_${name}.npz" --tpu.fused_step=off "$@" \
    || { echo "case $name FAILED (rc=$?)"; return; }
  python tools/compare_runs.py "/tmp/refrun/output/parity2/${name}_seed3" \
    "output/parity2/${name}_seed3" || echo "compare $name FAILED"
}

run caseA 600 --use_masks! --use_edges --alpha_initial=1 --alpha_final=1
run caseB 400 --use_masks --use_implicit_mask --use_edges!
run caseC 400 --use_masks --use_implicit_mask --use_edges --alpha_initial=0 --alpha_final=1
echo "=== all marf cases done $(date) ==="
