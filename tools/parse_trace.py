#!/usr/bin/env python3
"""Aggregate per-op device time from a jax.profiler trace (trace.json.gz).

Usage: python tools/parse_trace.py <run_dir_or_trace.json.gz> [--steps N] [--top K]

Finds the newest plugins/profile/*/**.trace.json.gz under the given dir,
groups TPU-device events by op name, and prints total device-time per op
group, sorted. With --steps N, also prints per-step ms (divide by the number
of train steps covered by the trace).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if path.endswith(".json.gz"):
        return path
    cands = sorted(glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True))
    if not cands:
        sys.exit(f"no *.trace.json.gz under {path}")
    return cands[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--steps", type=int, default=0, help="train steps covered by the trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--raw", action="store_true", help="group by full op name (no prefix collapsing)")
    args = ap.parse_args()

    trace_path = find_trace(args.path)
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device PIDs: process names containing "TPU" and thread names with "XLA Op"-ish lanes
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    if not device_pids:
        device_pids = set(pid_names)

    groups = collections.Counter()
    total = 0.0
    n_events = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        # keep op lanes; skip derived "Steps"/"Framework"-style lanes
        if "step" in tname.lower():
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))  # us
        if args.raw:
            key = name
        else:
            key = re.sub(r"\.\d+$", "", name)
            key = re.sub(r"\d+$", "", key)
        groups[key] += dur
        total += dur
        n_events += 1

    print(f"trace: {trace_path}")
    print(f"device events: {n_events}, total device-time: {total/1e3:.2f} ms")
    if args.steps:
        print(f"per-step device-time: {total/1e3/args.steps:.3f} ms over {args.steps} steps")
    width = max((len(k) for k, _ in groups.most_common(args.top)), default=10)
    for name, dur in groups.most_common(args.top):
        line = f"{name:<{width}}  {dur/1e3:9.2f} ms  {100*dur/total:5.1f}%"
        if args.steps:
            line += f"  {dur/1e3/args.steps:8.4f} ms/step"
        print(line)


if __name__ == "__main__":
    main()
