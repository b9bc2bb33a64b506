#!/bin/bash
# Round-5 final-evidence campaign. Order: parity gate first (CLAUDE.md
# rule: no timing counts after a kernel-path change until hardware
# partitions match the oracle), then the cheap ladders, then the
# expensive compiles (wb16 rungs inside the perf section; 8K last).
#
# Code state measured: fastpad (width-gated DMA pad/unpad) + CI fix.
# Programs at w < 2560 are byte-identical to round 4 (fastpad auto-off),
# so existing 540p-1440p turbo rows remain valid; the 4K turbo row is
# re-measured under the new program (sweep r5: 447.5 ms min — unchanged
# within noise).
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_campaign.pid
LOG=bench_out/r5_campaign_$(date +%Y%m%d_%H%M).log

ckpt() {
  git add bench_out docs 2>/dev/null
  git commit -q -m "$1" 2>/dev/null && echo "[ckpt] committed: $1" || true
}

{
  echo "=== 0. tunnel probe"
  if timeout 100000 bash scripts/tunnel_watch.sh; then
    echo "[tunnel] up"
  else
    echo "[tunnel] down >27h — abort"; exit 1
  fi

  echo "=== 1. parity gate (20-seed quality sweep + 540p blobs/textured)"
  timeout 7200 python scripts/check_tpu_parity.py || {
    echo "PARITY FAILED — stop; do not measure."
    ckpt "r5 parity gate FAILED"; exit 1; }
  ckpt "r5 parity gate clean (fastpad + CI-fix code)"

  echo "=== 2. quarantine pre-r5 turbo rows (final-gather changed every"
  echo "       turbo program; fastmst/superpixel/atomic paths untouched)"
  if [ ! -e bench_out/.r5_quarantine_done ]; then
    python - <<'EOF'
import json
rows = [json.loads(l) for l in open('bench_out/perf.jsonl') if l.strip()]
keep, moved = [], []
for r in rows:
    stale = str(r.get('algorithm', '')).startswith('turbo')
    (moved if stale else keep).append(r)
with open('bench_out/perf_prer5.jsonl', 'a') as f:
    for r in moved:
        f.write(json.dumps(r) + '\n')
with open('bench_out/perf.jsonl', 'w') as f:
    for r in keep:
        f.write(json.dumps(r) + '\n')
print(f"moved {len(moved)} turbo rows to perf_prer5.jsonl")
EOF
    touch bench_out/.r5_quarantine_done
  else
    echo "[quarantine] sentinel present — skip"
  fi

  echo "=== 3. perf ladders (turbo blobs 4K/5K + textured + variants + wb16)"
  timeout 14400 python scripts/run_evidence.py --sections perf
  ckpt "r5 perf ladders (resume state)"

  echo "=== 4. batch throughput"
  timeout 7200 python scripts/run_evidence.py --sections batch
  ckpt "r5 batch throughput"

  echo "=== 5. plots"
  timeout 1800 python scripts/run_evidence.py --sections plots
  ckpt "r5 plots"

  echo "=== 6. summary"
  python scripts/summarize_evidence.py > docs/EVIDENCE_r5.md 2>/dev/null \
    && echo "[summary] wrote docs/EVIDENCE_r5.md" || true
  ckpt "r5 evidence summary"

  echo "=== 7. 8K rung (multi-hour Mosaic gamble, last)"
  timeout 14400 python scripts/run_evidence.py --sections eightk
  ckpt "r5 8K rung attempt"

  echo "=== campaign done $(date -u +%FT%TZ)"
} 2>&1 | tee -a "$LOG"
