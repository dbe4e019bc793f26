#!/bin/bash
# Run the UNMODIFIED reference (read-only at /root/reference) on CPU torch,
# with tools/refshims providing its missing deps (kornia/easydict/torchvision/
# visdom/ipdb shims). Used to measure ground-truth convergence curves and
# steps/sec for parity comparison (BASELINE.md).
#
# Usage: tools/run_reference.sh <workdir> [extra train.py args...]
set -euo pipefail
WORKDIR=${1:?usage: run_reference.sh <workdir> [args...]}
shift || true
mkdir -p "$WORKDIR"
ln -sfn /root/reference/data "$WORKDIR/data"
ln -sfn /root/reference/options "$WORKDIR/options"
ln -sfn /root/reference/model "$WORKDIR/model"
cd "$WORKDIR"
export PYTHONPATH="/root/reference:/root/repo/tools/refshims"
export OMP_NUM_THREADS=${OMP_NUM_THREADS:-$(nproc)}
exec python3 /root/reference/train.py "$@"
