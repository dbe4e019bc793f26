"""Trace the train step of any bench case with jax.profiler.

Builds the exact trainer-compiled chunk bench.py times (same env knobs:
MARF_BENCH_CASE/SEED/DTYPE/FUSED_*), runs a few warm chunks, then traces a
short window and prints the per-op device-time table (tools/parse_trace.py).

Usage:
    python tools/profile_step.py [trace_dir] [--chunks=N]

Keep the traced window small (default 3 chunks x 20 steps) — long scans
hang the remote-compile tunnel (CLAUDE.md TPU rules).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench


def main():
    if any(a in ("--help", "-h") for a in sys.argv[1:]):
        print(__doc__)
        return
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trace_dir = args[0] if args else "/tmp/marf_prof"
    n_chunks = 3
    for a in sys.argv[1:]:
        if a.startswith("--chunks="):
            n_chunks = int(a.split("=", 1)[1])

    m, dataset = bench.build_model()
    bench.log(f"profiling case {bench.CASE} on {jax.devices()[0]} -> {trace_dir}")
    chunk = m._chunk(20)
    state, data = m.state, m.train_data
    # sync by pulling metrics to the host — block_until_ready can return
    # early on this runtime (PERF.md round-5), which would end the trace
    # window before the traced chunks finished executing
    for _ in range(2):
        state, mets = chunk(state, data)
    jax.device_get(mets)
    with jax.profiler.trace(trace_dir):
        for _ in range(n_chunks):
            state, mets = chunk(state, data)
        jax.device_get(mets)
    bench.log(f"traced {n_chunks * 20} steps")
    os.system(f"{sys.executable} {os.path.join(os.path.dirname(__file__), 'parse_trace.py')} {trace_dir} --raw --top 25")


if __name__ == "__main__":
    main()
