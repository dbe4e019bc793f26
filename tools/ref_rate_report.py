"""Derive the reference's CPU-torch it/s from a tools/ref_rate.sh run.

Reads the TensorBoard scalar events the UNMODIFIED reference wrote
(freq.scalar=20, so every event row carries a wall_time stamp 20 iterations
apart) and reports the per-window rate plus a summary. Method matches the
canonical 0.19 it/s row (PARITY.md): wall-clock between scalar-event
timestamps, steady state only (the first window absorbs warmup/vis setup).

The BEST (fastest) clean window is reported as the headline rate — the
measurement machine is shared, so transient host contention can only slow
the reference down; taking the fastest window is the reference-favorable
bound that BASELINE_MEASURED.md's GPU estimates scale from.

Usage:
    python tools/ref_rate_report.py /tmp/refrate/output/rate/implicit_seed3 \
                                    /tmp/refrate/output/rate/implicit_single_seed3
"""

import sys


def windows(run_dir):
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    ea = EventAccumulator(run_dir, size_guidance={"scalars": 0})
    ea.Reload()
    tag = "train/loss/all" if "train/loss/all" in ea.Tags()["scalars"] else ea.Tags()["scalars"][0]
    rows = [(s.step, s.wall_time) for s in ea.Scalars(tag)]
    rows.sort()
    out = []
    for (s0, t0), (s1, t1) in zip(rows, rows[1:]):
        if s1 > s0 and t1 > t0:
            out.append((s0, s1, (s1 - s0) / (t1 - t0)))
    return out


def main(argv):
    for run_dir in argv[1:]:
        ws = windows(run_dir)
        if not ws:
            print(f"{run_dir}: no scalar windows")
            continue
        steady = ws[1:] if len(ws) > 1 else ws
        best = max(r for _, _, r in steady)
        import statistics

        med = statistics.median(r for _, _, r in steady)
        print(f"\n== {run_dir} ==")
        for s0, s1, r in ws:
            print(f"  it {s0:4d} -> {s1:4d}: {r:.4f} it/s ({1.0 / r:.1f} s/it)")
        print(f"  windows (steady): {len(steady)}; median {med:.4f} it/s; "
              f"BEST {best:.4f} it/s ({1.0 / best:.1f} s/it) <- reference-favorable bound")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
