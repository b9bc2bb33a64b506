#!/bin/bash
# Post-outage runbook: run this when the axon TPU tunnel comes back.
# Order matters (CLAUDE.md round-3 lesson): oracle parity FIRST — kernels
# can return stable-but-wrong partitions with clean flags, so no timing
# counts until partitions match the NumPy oracle on hardware. Each step
# aborts the rest on failure; the script's exit status reflects it.
set -u -o pipefail
cd "$(dirname "$0")/.."
LOG=bench_out/tunnel_up_$(date +%Y%m%d_%H%M).log
mkdir -p bench_out
{
  echo "=== 1. oracle parity (20-seed quality sweep + 540p blobs/textured)"
  timeout 5400 python scripts/check_tpu_parity.py || {
    echo "PARITY FAILED — stop; do not measure."; exit 1; }

  echo "=== 2. flagship bench sanity (1080p turbo)"
  timeout 3600 python bench.py || {
    echo "BENCH SANITY FAILED — stop before burning campaign time."
    exit 1; }

  echo "=== 2.5 bounded knob sweep (oracle-checked per config; decides"
  echo "        GSEG_GATE_DIV for the campaign)"
  timeout 14400 python scripts/sweep_knobs.py \
      --shapes 1080x1920,2160x3840 \
      --configs baseline,nosmall,gate13,gate32 || true
  # Promote a knob into the campaign env ONLY if its sweep row is faster
  # AND carries oracle_equal=true at BOTH shapes. Before making any knob
  # a code default, also rerun scripts/check_tpu_parity.py with that env.

  echo "=== 3. evidence campaign (perf ladders + batch + BSDS-protocol"
  echo "       quality + plots; perf checkpoints per rung, 8K last)"
  timeout 36000 python scripts/run_evidence.py \
      --sections perf,batch,bsds,plots
} 2>&1 | tee "$LOG"
