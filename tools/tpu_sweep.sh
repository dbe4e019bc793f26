#!/bin/bash
# Round-4 TPU measurement sweep (VERDICT r3 items 1/2/5): measures the
# round-3 perf deliverables that the tunnel outage left unverified —
# dedup on/off, flat Adam (now default everywhere), MARF_FUSED_STREAMS,
# bf16 on the current v4/v5 kernel — across all five eval cases.
# One JSON line per run in $MARF_SWEEP_OUT (default /tmp/tpu_sweep.jsonl).
#
# MARF_SWEEP_RESUME=1 appends to an existing $MARF_SWEEP_OUT and skips tags
# that already have a measured row — so a mid-sweep tunnel death costs only
# the unfinished rows on the next attempt (tools/tpu_watch.sh retries with
# this set). Error rows are retried; harvest_sweep keeps the LAST row per
# tag, so a later good row supersedes an earlier error row. NOTE: resume
# assumes the code under measurement hasn't changed between attempts.
# Exit status: 0 iff every expected tag has a measured/ok row.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
# whoever runs the sweep owns the TPU window (and usually holds /tmp/tpu_lock,
# per CLAUDE.md) — its bench children must not wait on their own lock
export MARF_TPU_LOCK_OWNER="${MARF_TPU_LOCK_OWNER:-1}"
OUT="${MARF_SWEEP_OUT:-/tmp/tpu_sweep.jsonl}"
LOG="${MARF_SWEEP_LOG:-/tmp/tpu_sweep.log}"
if [ -z "${MARF_SWEEP_RESUME:-}" ] || [ ! -e "$OUT" ]; then : > "$OUT"; fi

BENCH_TAGS=""

have() { grep -q "$1" "$OUT"; }

run() {
  # Capture bench's last stdout line; a JSON object line is the result row
  # (bench prints it even on a golden-check exit 1), anything else — a
  # timeout-killed/crashed run — gets an explicit error row. (A plain
  # '|| echo error' after the pipe would be dead code: the pipeline's status
  # is sed/tail's, so a killed bench would silently write no row at all.)
  local tag=$1; shift
  BENCH_TAGS="$BENCH_TAGS $tag"
  if [ -n "${MARF_SWEEP_RESUME:-}" ] && have "\"tag\": \"$tag\", \"r\":"; then
    echo "=== $tag already measured, skipped (resume) ===" >> "$LOG"
    return
  fi
  echo "=== $tag $(date -u +%H:%M:%S) ===" >> "$LOG"
  local line
  line=$(timeout 2400 env "$@" python bench.py 2>>"$LOG" | tail -1)
  case "$line" in
    *'"error"'*)
      # bench's own outage JSON ({"value": null, "error": "backend_unavailable"})
      # must NOT count as a measurement — record an error row (retried on
      # resume) and keep the payload in the log for forensics. A real
      # measurement line never carries an "error" key (golden failures are
      # extra.golden.ok=false).
      echo "$tag: $line" >> "$LOG"
      echo "{\"tag\": \"$tag\", \"error\": true}" >> "$OUT" ;;
    "{"*) echo "{\"tag\": \"$tag\", \"r\": $line}" >> "$OUT" ;;
    *)    echo "{\"tag\": \"$tag\", \"error\": true}" >> "$OUT" ;;
  esac
}

AUX_TAGS=""

aux() {
  # Non-bench stage (profiler trace / tripwire): tag + command...
  local tag=$1; shift
  AUX_TAGS="$AUX_TAGS $tag"
  if [ -n "${MARF_SWEEP_RESUME:-}" ] && have "\"tag\": \"$tag\", \"ok\": true"; then
    echo "=== $tag already ok, skipped (resume) ===" >> "$LOG"
    return
  fi
  echo "=== $tag $(date -u +%H:%M:%S) ===" >> "$LOG"
  if "$@" >> "$LOG" 2>&1; then
    echo "{\"tag\": \"$tag\", \"ok\": true}" >> "$OUT"
  else
    echo "{\"tag\": \"$tag\", \"ok\": false}" >> "$OUT"
  fi
}

# 1. current defaults (flat adam + sq output); implicit600 forces dedup=on —
#    its golden check on real TPU is the hardware validation the 'auto'
#    default gate (models/planar.dedup_hw_validated) is waiting for.
#    The first run keeps the backend probe (outage insurance if the sweep is
#    launched by hand without one); later runs skip it — the tunnel was
#    green seconds ago, and the probe costs a full TPU client init each.
run canonical600      MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600
# only drop the probe once canonical600 has a MEASURED row (this attempt or a
# resumed one) — an outage-classified first run keeps the probe so later runs
# fail in 90s instead of hanging for their full 2400s timeout
if have '"tag": "canonical600", "r":'; then export MARF_BENCH_PROBE=0; fi
# headline recapture (3000 iters, golden check ON, same compiled program as
# canonical600 → compile-cache hit): lands the >=428 steps/s evidence even if
# the tunnel dies again before the driver's end-of-round bench
run canonical3000     MARF_BENCH_CASE=canonical
run implicit600       MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_FUSED_DEDUP=on
run implicit_s600     MARF_BENCH_CASE=implicit_single MARF_BENCH_ITERS=600
run noposenc600       MARF_BENCH_CASE=noposenc MARF_BENCH_ITERS=600
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
# 3. bf16 re-measure on the shipping v4/v5 kernel (VERDICT r2 item 7).
#    bf16 alone measured flat on earlier variants — consistent with the
#    dependent-chain bound (PERF.md): if the kernel is serialized on one
#    chain's latency, halving matmul cost doesn't shorten the critical path.
#    Streams break the serialization, so bf16's 2x MXU rate may only pay off
#    COMBINED with streams — measured here.
run canon_bf16        MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_DTYPE=bfloat16
run canon_s2_bf16     MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_FUSED_STREAMS=2 MARF_BENCH_DTYPE=bfloat16
run implicit_s2_bf16  MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_BENCH_FUSED_DEDUP=on MARF_FUSED_STREAMS=2 MARF_BENCH_DTYPE=bfloat16
# 4. implicit dedup off (isolate the dedup win)
run implicit_nodedup  MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_BENCH_FUSED_DEDUP=off
# 4b. profiler traces for the post-sweep glue attack (per-op tables into the
#     log; tiny traced windows per CLAUDE.md tunnel rules)
aux profile_implicit  timeout 1200 env MARF_BENCH_CASE=implicit MARF_BENCH_FUSED_DEDUP=on \
                        python tools/profile_step.py /tmp/marf_prof_implicit
aux profile_canonical timeout 1200 env MARF_BENCH_CASE=canonical \
                        python tools/profile_step.py /tmp/marf_prof_canonical
# 5. XLA miscompile tripwire (shipped edge-conv layout must stay NaN-free)
aux miscompile_tripwire timeout 2400 python tools/xla_miscompile_tripwire.py

# Completeness gate: exit 0 only if every tag has a measured/ok row (the
# watcher retries an incomplete sweep on the next green probe).
missing=0
for t in $BENCH_TAGS; do
  have "\"tag\": \"$t\", \"r\":" || { echo "MISSING $t" >> "$LOG"; missing=1; }
done
for t in $AUX_TAGS; do
  have "\"tag\": \"$t\", \"ok\": true" || { echo "MISSING $t" >> "$LOG"; missing=1; }
done
echo "SWEEP DONE missing=$missing $(date -u)" >> "$LOG"
exit $missing
