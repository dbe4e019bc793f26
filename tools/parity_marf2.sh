#!/bin/bash
# marf_tpu side of the round-3 ablation parity cases (VERDICT r2 item 4):
# the alpha-schedule variants (sweep cases 5/6) and masks-only / alpha=1
# (cases 1/3) — the loss-surface arithmetic no prior comparison exercised.
# Reference runs: /tmp/refbg2/chain2.sh (completed 2026-08-17). Same-init
# transplant via --load_torch_init, true-f32 matmuls to match CPU torch.
#
# Usage: bash tools/parity_marf2.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export MARF_YES=1
export JAX_DEFAULT_MATMUL_PRECISION=highest
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

run() {
  local name=$1 iters=$2; shift 2
  if [ ! -f "/tmp/torch_init_${name}.npz" ]; then
    echo "!! /tmp/torch_init_${name}.npz missing (reference run not done?) — skipping $name"
    return
  fi
  echo "=== marf case $name ($iters iters) $(date) ==="
  # MARF_PARITY_EXTRA: e.g. --cpu when the TPU tunnel is down (f32-highest
  # matmuls are identical either way; only wall-clock differs)
  python train.py --group=parity2 --model=planar --yaml=planar --name="$name" \
    --seed=3 --barf_c2f=[0,0.4] --max_iter="$iters" \
    --load_torch_init="/tmp/torch_init_${name}.npz" --tpu.fused_step=off \
    ${MARF_PARITY_EXTRA:-} "$@" \
    || { echo "case $name FAILED (rc=$?)"; return; }
  python tools/compare_runs.py "/tmp/refrun/output/parity2/${name}_seed3" \
    "output/parity2/${name}_seed3" || echo "compare $name FAILED"
}

# reference script.py case list (sweep.py CASES): 5 = masks+edges alpha 1->0,
# 6 = masks+edges alpha=0.5 const, 1 = masks only, 3 = masks+edges alpha=1
run case5 300 --use_masks --use_edges --alpha_initial=1 --alpha_final=0
run case6 300 --use_masks --use_edges --alpha_initial=0.5 --alpha_final=0.5
run case1 200 --use_masks --use_edges!
run case3 200 --use_masks --use_edges --alpha_initial=1 --alpha_final=1
echo "=== all round-3 marf cases done $(date) ==="
