#!/bin/bash
# BASELINE eval config 5 (VERDICT r4 missing-4): full canonical visualization
# runs on real TPU — vis/ frame dumps + TB image panels every freq.vis=100
# iterations + the vis.mp4 mux (cv2 mp4v fallback in this ffmpeg-less image)
# — across multiple seeds, plus a vis-quiet twin (freq.vis=max_iter, one
# final frame) so the visualization overhead is a measured number rather
# than a claim. Reference behavior being reproduced:
# /root/reference/model/planar.py:163-165 (mux) and :256-292 (TB panels).
#
# Usage (hold /tmp/tpu_lock per the one-TPU-process rule):
#   bash tools/vis_runs.sh [max_iter]   # default 3000
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
export MARF_YES=1
ITERS="${1:-3000}"

for seed in 3 1 2; do
  echo "=== vis run seed $seed ($ITERS iters, freq.vis=100) $(date -u +%H:%M:%S) ==="
  timeout 2400 python train.py --group=vis --model=planar --yaml=planar \
    --name=canonical --seed="$seed" --barf_c2f=[0,0.4] --max_iter="$ITERS" \
    || echo "seed $seed FAILED rc=$?"
done

echo "=== vis-quiet timing twin (seed 3, freq.vis=$ITERS) $(date -u +%H:%M:%S) ==="
timeout 2400 python train.py --group=vis --model=planar --yaml=planar \
  --name=quiet --seed=3 --barf_c2f=[0,0.4] --max_iter="$ITERS" \
  --freq.vis="$ITERS" || echo "quiet twin FAILED rc=$?"

echo "=== artifacts ==="
for d in output/vis/canonical_seed3 output/vis/canonical_seed1 output/vis/canonical_seed2 output/vis/quiet_seed3; do
  [ -d "$d" ] && echo "$d: $(ls "$d" | tr '\n' ' ')" && ls "$d/vis" 2>/dev/null | wc -l
done
