#!/bin/bash
# Round-4 TPU measurement sweep (VERDICT r3 items 1/2/5): measures the
# round-3 perf deliverables that the tunnel outage left unverified —
# dedup on/off, flat Adam (now default everywhere), MARF_FUSED_STREAMS,
# bf16 on the current v4/v5 kernel — across all five eval cases.
# One JSON line per run in $MARF_SWEEP_OUT (default /tmp/tpu_sweep.jsonl).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
OUT="${MARF_SWEEP_OUT:-/tmp/tpu_sweep.jsonl}"
LOG="${MARF_SWEEP_LOG:-/tmp/tpu_sweep.log}"
: > "$OUT"

run() {
  # Capture bench's last stdout line; a JSON object line is the result row
  # (bench prints it even on a golden-check exit 1), anything else — a
  # timeout-killed/crashed run — gets an explicit error row. (The previous
  # '|| echo error' after the pipe was dead code: the pipeline's status was
  # tail/sed's, so a killed bench silently wrote no row at all.)
  local tag=$1; shift
  echo "=== $tag $(date -u +%H:%M:%S) ===" >> "$LOG"
  local line
  line=$(timeout 2400 env "$@" python bench.py 2>>"$LOG" | tail -1)
  case "$line" in
    "{"*) echo "{\"tag\": \"$tag\", \"r\": $line}" >> "$OUT" ;;
    *)    echo "{\"tag\": \"$tag\", \"error\": true}" >> "$OUT" ;;
  esac
}

# 1. current defaults (flat adam + sq output); implicit600 forces dedup=on —
#    its golden check on real TPU is the hardware validation the 'auto'
#    default gate (models/planar.dedup_hw_validated) is waiting for.
#    The first run keeps the backend probe (outage insurance if the sweep is
#    launched by hand without one); later runs skip it — the tunnel was
#    green seconds ago, and the probe costs a full TPU client init each.
run canonical600      MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0
# only drop the probe if the first run actually reached the chip — otherwise
# later runs would hang for their full 2400s timeout instead of failing in 90s
if ! tail -1 "$OUT" | grep -q '"error"'; then export MARF_BENCH_PROBE=0; fi
# headline recapture (3000 iters, golden check ON, same compiled program as
# canonical600 → compile-cache hit): lands the >=428 steps/s evidence even if
# the tunnel dies again before the driver's end-of-round bench
run canonical3000     MARF_BENCH_CASE=canonical
run implicit600       MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_FUSED_DEDUP=on
run implicit_s600     MARF_BENCH_CASE=implicit_single MARF_BENCH_ITERS=600
run noposenc600       MARF_BENCH_CASE=noposenc MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0
run edges600          MARF_BENCH_CASE=edges_only MARF_BENCH_ITERS=600
# 2. streams sweep
run canon_s2          MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_FUSED_STREAMS=2
run canon_s3          MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_FUSED_STREAMS=3
run implicit_s2       MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_BENCH_FUSED_DEDUP=on MARF_FUSED_STREAMS=2
run implicit_single_s2 MARF_BENCH_CASE=implicit_single MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_FUSED_STREAMS=2
# 2b. lazy-metrics attribution (chunk-final-only edge term / hom error /
#     Mask_Error; auto = on-TPU default)
run canon_lazyoff     MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_BENCH_LAZY_METRICS=off
run implicit_lazyoff  MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_BENCH_FUSED_DEDUP=on MARF_BENCH_LAZY_METRICS=off
# 3. bf16 re-measure on the shipping v4/v5 kernel (VERDICT r2 item 7)
run canon_bf16        MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_DTYPE=bfloat16
# 4. implicit dedup off (isolate the dedup win)
run implicit_nodedup  MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_BENCH_FUSED_DEDUP=off
# 4b. profiler traces for the post-sweep glue attack (per-op tables into the
#     log; tiny traced windows per CLAUDE.md tunnel rules)
( timeout 1200 env MARF_BENCH_CASE=implicit MARF_BENCH_FUSED_DEDUP=on \
    python tools/profile_step.py /tmp/marf_prof_implicit >> "$LOG" 2>&1 \
    && echo '{"tag": "profile_implicit", "ok": true}' >> "$OUT" ) \
  || echo '{"tag": "profile_implicit", "ok": false}' >> "$OUT"
( timeout 1200 env MARF_BENCH_CASE=canonical \
    python tools/profile_step.py /tmp/marf_prof_canonical >> "$LOG" 2>&1 \
    && echo '{"tag": "profile_canonical", "ok": true}' >> "$OUT" ) \
  || echo '{"tag": "profile_canonical", "ok": false}' >> "$OUT"
# 5. XLA miscompile tripwire (shipped edge-conv layout must stay NaN-free)
( timeout 2400 python tools/xla_miscompile_tripwire.py >> "$LOG" 2>&1 \
    && echo '{"tag": "miscompile_tripwire", "ok": true}' >> "$OUT" ) \
  || echo '{"tag": "miscompile_tripwire", "ok": false}' >> "$OUT"
echo "SWEEP DONE $(date -u)" >> "$LOG"
