"""Minimal steady-state timer for one bench case (kernel experiments).

Builds the exact trainer-compiled chunk bench.py uses (same env knobs:
MARF_BENCH_CASE/ITERS/SEED/DTYPE/FUSED_*/MARF_FUSED_STREAMS/...), runs one
warm chunk, then times (MARF_BENCH_ITERS - 100) steps. Syncs by PULLING a
metric to the host — jax.block_until_ready can return early on this runtime
(PERF.md round-5; CLAUDE.md tunnel rules). No golden check, no probe: use
bench.py for official numbers.

Usage:
    MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 python tools/quick_time.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    m, _ = bench.build_model()
    chunk = m._chunk(100)
    state, data = m.state, m.train_data
    state, metrics = chunk(state, data)
    np.asarray(metrics["PSNR"])
    n = bench.MAX_ITER - 100
    t0 = time.perf_counter()
    for _ in range(n // 100):
        state, metrics = chunk(state, data)
    np.asarray(metrics["PSNR"])
    dt = time.perf_counter() - t0
    print(f"RESULT: {n} steps in {dt:.2f}s -> {n / dt:.1f} steps/s "
          f"(case={bench.CASE}, PSNR={float(np.asarray(metrics['PSNR'])[-1]):.3f})")


if __name__ == "__main__":
    main()
