#!/bin/bash
# Round-5 TPU measurement sweep (VERDICT r4 items 3/6/9): re-measures the
# standard eval cases as harvestable rows (the round-4 finals lived only in
# PERF.md prose), records the full-3000 bf16 canonical outcome, isolates the
# dedup win, and carries the ready-to-run multi-chip stage that auto-skips
# on the 1-chip tunnel. One JSON line per run in $MARF_SWEEP_OUT (default
# /tmp/tpu_sweep.jsonl); archive completed sweeps under tools/sweeps/.
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
  # rc classification (VERDICT r4 weak-2): rc 124/137 = the stage was
  # timeout-killed — an infra-outage row ("error": true, retried on resume),
  # NOT a tool verdict; any other nonzero rc is the tool's own failure
  # ("ok": false — e.g. the tripwire's "shipped pattern produced NaN").
  local tag=$1; shift
  AUX_TAGS="$AUX_TAGS $tag"
  if [ -n "${MARF_SWEEP_RESUME:-}" ] && have "\"tag\": \"$tag\", \"ok\": true"; then
    echo "=== $tag already ok, skipped (resume) ===" >> "$LOG"
    return
  fi
  echo "=== $tag $(date -u +%H:%M:%S) ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  local rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "{\"tag\": \"$tag\", \"ok\": true}" >> "$OUT"
  elif [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    echo "{\"tag\": \"$tag\", \"error\": true, \"rc\": $rc}" >> "$OUT"
  else
    echo "{\"tag\": \"$tag\", \"ok\": false, \"rc\": $rc}" >> "$OUT"
  fi
}

# 1. standard eval cases at current defaults, golden checks ON — the
#    harvestable confirmation rows for the headline table (VERDICT r4 item 3).
#    implicit600 forces dedup=on: its golden check on real TPU IS the
#    hardware validation harvest_sweep re-records (with the env stamp) into
#    marf_tpu/hw_validation.json.
#    The first run keeps the backend probe (outage insurance if the sweep is
#    launched by hand without one); later runs skip it — the tunnel was
#    green seconds ago, and the probe costs a full TPU client init each.
run canonical600      MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600
# only drop the probe once canonical600 has a MEASURED row (this attempt or a
# resumed one) — an outage-classified first run keeps the probe so later runs
# fail in 90s instead of hanging for their full 2400s timeout
if have '"tag": "canonical600", "r":'; then export MARF_BENCH_PROBE=0; fi
# headline recapture (3000 iters, golden check ON, same compiled program as
# canonical600 → compile-cache hit)
run canonical3000     MARF_BENCH_CASE=canonical
run implicit600       MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_FUSED_DEDUP=on
run implicit_s600     MARF_BENCH_CASE=implicit_single MARF_BENCH_ITERS=600
run noposenc600       MARF_BENCH_CASE=noposenc MARF_BENCH_ITERS=600
run edges600          MARF_BENCH_CASE=edges_only MARF_BENCH_ITERS=600
# 2. dedup attribution (isolate the dedup win on the same code)
run implicit_nodedup  MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_BENCH_FUSED_DEDUP=off
# 3. bf16: the documented speed knob. canon3000_bf16 records the FULL-3000
#    convergence outcome (VERDICT r4 item 6 — the yaml note previously rested
#    on 600-iter evidence only; bench skips the f32 goldens for bf16 runs and
#    just reports the PSNR).
run canon_bf16        MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_DTYPE=bfloat16
run canon3000_bf16    MARF_BENCH_CASE=canonical MARF_BENCH_DTYPE=bfloat16
run implicit_bf16     MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_FUSED_DEDUP=on MARF_BENCH_DTYPE=bfloat16
# 4. profiler traces for per-op attribution (tiny traced windows per
#    CLAUDE.md tunnel rules)
aux profile_implicit  timeout 1200 env MARF_BENCH_CASE=implicit MARF_BENCH_FUSED_DEDUP=on \
                        python tools/profile_step.py /tmp/marf_prof_implicit
aux profile_implicit_single timeout 1200 env MARF_BENCH_CASE=implicit_single \
                        python tools/profile_step.py /tmp/marf_prof_implicit_single
aux profile_canonical timeout 1200 env MARF_BENCH_CASE=canonical \
                        python tools/profile_step.py /tmp/marf_prof_canonical
# 5. XLA miscompile tripwire (shipped edge-conv layout must stay NaN-free)
aux miscompile_tripwire timeout 2400 python tools/xla_miscompile_tripwire.py
# 6. stretch (VERDICT r4 item 9): multi-chip throughput — per-image heads and
#    canonical under shard_map on a real mesh. Auto-skips on the 1-chip
#    tunnel; the day a pod window appears, these rows measure themselves.
NDEV=$(timeout 120 python -c "import jax; print(len(jax.devices()))" 2>>"$LOG" || echo 1)
if [ "${NDEV:-1}" -gt 1 ] 2>/dev/null; then
  run implicit_single_mesh MARF_BENCH_CASE=implicit_single MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_DEVICES="$NDEV"
  run implicit_mesh        MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_BENCH_FUSED_DEDUP=on MARF_DEVICES="$NDEV"
  run canonical_mesh       MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_DEVICES="$NDEV"
fi

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
