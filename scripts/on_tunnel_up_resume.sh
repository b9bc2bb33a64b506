#!/bin/bash
# Round-4 RESUME runbook: the box rebooted mid-campaign (2026-08-19 ~20:05,
# post-wake turbo ladder re-run had just started). The knob sweep already
# ran to verdict on the chip (library defaults stand — bench_out/sweep.jsonl,
# docs/RESULTS_r4.md §4.2), so this chain skips stage 2.5/2.6 of
# on_tunnel_up.sh and goes parity gate -> bench sanity -> evidence campaign
# (which self-resumes per rung; fig3/quality/bsds artifacts exist and are
# skipped automatically).
#
# Parity first is non-negotiable (CLAUDE.md round-3 lesson): commits since
# the last clean on-chip gate touched extract.py (run_extract window fix)
# and gossip probes; no timing counts until hardware partitions match the
# NumPy oracle again.
set -u -o pipefail
cd "$(dirname "$0")/.."
LOG=bench_out/tunnel_resume_$(date +%Y%m%d_%H%M).log
mkdir -p bench_out

ckpt() {  # commit current artifacts, never fail the chain
  git add -A bench_out docs 2>/dev/null
  git commit -q -m "$1" 2>/dev/null && echo "[ckpt] committed: $1" || true
}

{
  echo "=== 1. oracle parity (20-seed quality sweep + 540p blobs/textured)"
  timeout 5400 python scripts/check_tpu_parity.py || {
    echo "PARITY FAILED — stop; do not measure."
    ckpt "TPU parity gate FAILED — resume campaign aborted before timing"
    exit 1; }
  ckpt "TPU parity gate clean (resume after reboot)"

  echo "=== 2. flagship bench sanity (1080p turbo)"
  timeout 3600 python bench.py || {
    echo "BENCH SANITY FAILED — stop before burning campaign time."
    ckpt "bench.py sanity FAILED after clean parity gate (resume)"
    exit 1; }
  ckpt "bench.py sanity pass on real chip (resume)"

  echo "=== 3. evidence campaign (self-resuming: perf rungs checkpointed,"
  echo "       fig3/quality/bsds skip on existing artifacts; 8K last)"
  timeout 36000 python scripts/run_evidence.py \
      --sections perf,batch,fig3,quality,bsds,eightk,plots
  ckpt "TPU evidence campaign artifacts (resumed post-reboot)"

  echo "=== 3.4 speed sweep: dist-free peel rounds (corrected scatter cost"
  echo "        model — probe_pieces r4; subsum default was kept on a"
  echo "        fence-noised number)"
  timeout 7200 python scripts/sweep_knobs.py \
      --shapes 1080x1920 \
      --configs peelcount || true
  PEELWIN=$(python - <<'EOF'
import json
rows = [json.loads(l) for l in open('bench_out/sweep.jsonl') if l.strip()]
def best(cfg):
    ms = [r['mean_ms'] for r in rows
          if r.get('config') == cfg and r.get('oracle_equal')
          and r.get('weight_buckets', 0) == 0
          and (r['height'], r['width']) == (1080, 1920)]
    return min(ms) if ms else None
b, p = best('baseline'), best('peelcount')
print('yes' if (b and p and p < 0.98 * b) else 'no')
EOF
)
  if [ "$PEELWIN" = "yes" ]; then
    echo "[sweep] peelcount wins at 1080p — confirming at 4K"
    timeout 7200 python scripts/sweep_knobs.py \
        --shapes 2160x3840 --configs baseline,peelcount || true
  fi
  python scripts/promote_knobs.py \
      --sweep bench_out/sweep.jsonl --out bench_out/promoted_env.sh || true
  ckpt "peelcount speed sweep on chip (dist-free peel rounds A/B)"

  echo "=== 3.5 wb16 gate sweep (oracle-gated; probe_qrounds predicts the"
  echo "        v/32 gate runs ~3 more pixel-scale rounds than v/16 needs —"
  echo "        see bench_out/probe_qrounds_*.log)"
  timeout 10800 python scripts/sweep_knobs.py --wb16 \
      --shapes 1080x1920 \
      --configs baseline,gateq16,gateq8 || true
  python scripts/promote_knobs.py \
      --sweep bench_out/sweep.jsonl --out bench_out/promoted_env.sh || true
  ckpt "wb16 gate-knob sweep on chip (gateq16/gateq8 vs baseline)"

  echo "=== 4. evidence summary tables"
  python scripts/summarize_evidence.py > docs/EVIDENCE_r4.md 2>/dev/null \
    && echo "[summary] wrote docs/EVIDENCE_r4.md" || true
  ckpt "Evidence summary tables (round 4)"
} 2>&1 | tee "$LOG"
