#!/bin/bash
# Round-3 TPU measurement sweep (run when the tunnel is back).
# Results: one JSON line per run in /tmp/tpu_sweep.jsonl
set -u
cd "$(dirname "$0")"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
OUT=/tmp/tpu_sweep.jsonl
: > "$OUT"

run() {
  local tag=$1; shift
  echo "=== $tag $(date -u +%H:%M:%S) ===" >> /tmp/tpu_sweep.log
  ( timeout 2000 env "$@" python bench.py 2>>/tmp/tpu_sweep.log \
      | tail -1 | sed "s/^/{\"tag\": \"$tag\", \"r\": /; s/$/}/" >> "$OUT" ) \
    || echo "{\"tag\": \"$tag\", \"error\": true}" >> "$OUT"
}

# 1. current defaults (flat adam + sq output + dedup for implicit)
run canonical600      MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0
run implicit600       MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600
run implicit_s600     MARF_BENCH_CASE=implicit_single MARF_BENCH_ITERS=600
run noposenc600       MARF_BENCH_CASE=noposenc MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0
run edges600          MARF_BENCH_CASE=edges_only MARF_BENCH_ITERS=600
# 2. streams sweep
run canon_s2          MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_FUSED_STREAMS=2
run canon_s3          MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_FUSED_STREAMS=3
run implicit_s2       MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_FUSED_STREAMS=2
run implicit_single_s2 MARF_BENCH_CASE=implicit_single MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_FUSED_STREAMS=2
# 3. bf16 re-measure (VERDICT item 7)
run canon_bf16        MARF_BENCH_CASE=canonical MARF_BENCH_ITERS=600 MARF_BENCH_DTYPE=bfloat16
# 4. implicit dedup off (isolate the dedup win)
run implicit_nodedup  MARF_BENCH_CASE=implicit MARF_BENCH_ITERS=600 MARF_BENCH_CHECK=0 MARF_BENCH_FUSED_DEDUP=off
echo "SWEEP DONE $(date -u)" >> /tmp/tpu_sweep.log
