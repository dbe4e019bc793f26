"""Compare TensorBoard scalar curves between two runs (reference vs marf_tpu).

The two frameworks emit identical tags at identical cadences
(train/loss_render, train/loss_rgb, train/loss_edge, train/loss_mask,
train/PSNR, train/Homography_Error, train/Mask_Error), so parity is a direct
curve diff. Prints per-tag aligned-step deltas and finals.

Usage:
    python tools/compare_runs.py <ref_run_dir> <our_run_dir> [--json]
"""

import json
import sys


def load_scalars(run_dir: str) -> dict:
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    ea = EventAccumulator(run_dir, size_guidance={"scalars": 0})
    ea.Reload()
    out = {}
    for tag in ea.Tags()["scalars"]:
        out[tag] = {s.step: s.value for s in ea.Scalars(tag)}
    return out


def compare(ref: dict, ours: dict) -> dict:
    report = {}
    for tag in sorted(set(ref) | set(ours)):
        r, o = ref.get(tag), ours.get(tag)
        if not r or not o:
            report[tag] = {"status": "missing_in_" + ("ours" if not o else "ref")}
            continue
        common = sorted(set(r) & set(o))
        if not common:
            report[tag] = {"status": "no_common_steps"}
            continue
        diffs = [abs(r[s] - o[s]) for s in common]
        last = common[-1]
        report[tag] = {
            "status": "ok",
            "steps_compared": len(common),
            "last_step": last,
            "ref_final": r[last],
            "ours_final": o[last],
            "final_abs_diff": abs(r[last] - o[last]),
            "mean_abs_diff": sum(diffs) / len(diffs),
            "max_abs_diff": max(diffs),
        }
    return report


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    as_json = "--json" in sys.argv
    ref_dir, our_dir = args[0], args[1]
    report = compare(load_scalars(ref_dir), load_scalars(our_dir))
    if as_json:
        print(json.dumps(report, indent=2))
        return
    for tag, r in report.items():
        if r.get("status") != "ok":
            print(f"{tag:30s} {r['status']}")
            continue
        print(
            f"{tag:30s} n={r['steps_compared']:<4d} @it{r['last_step']:<6d} "
            f"ref={r['ref_final']:10.4f} ours={r['ours_final']:10.4f} "
            f"|d|final={r['final_abs_diff']:8.4f} |d|mean={r['mean_abs_diff']:8.4f}"
        )


if __name__ == "__main__":
    main()
