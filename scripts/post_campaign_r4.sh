#!/bin/bash
# Round-4 follow-up, run AFTER the resumed evidence campaign finishes.
# Order chosen so the turbo ladder is re-measured ONCE, under the final
# code+knob state:
#
#   1. parity gate under the NEW code (idle-compmin landed mid-campaign;
#      CLAUDE.md rule: no timing counts after a kernel-path change until
#      hardware partitions match the oracle again),
#   2. oracle-gated knob sweeps queued this round (peelcount speed,
#      gateq16/gateq8 wb16 runtime) — their baseline rows double as the
#      idle-compmin A/B at 1080p,
#   3. promotion -> campaign env (bench.py sources it; code-default flips
#      are a human decision recorded in RESULTS, not automated here),
#   4. re-measure the turbo rungs (the campaign's plain-turbo rows timed
#      the pre-idle-compmin in-flight process; rows are moved aside —
#      8K and turbo_wb16 rows are kept, see the mover comment),
#   5. plots + summary tables.
#
# All three knob configs were pre-verified oracle-exact on CPU at 540p
# blobs+textured before entering the sweep (session-3 log).
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/post_campaign_run.pid  # end-of-round free_chip.sh target
LOG=bench_out/post_campaign_$(date +%Y%m%d_%H%M).log

ckpt() {
  git add -A bench_out docs 2>/dev/null
  git commit -q -m "$1" 2>/dev/null && echo "[ckpt] committed: $1" || true
}

{
  echo "=== 0. wait for the tunnel (the waiter may fire this runbook right"
  echo "       after a campaign was killed over a DEAD tunnel; session-3"
  echo "       rule: never start a gate/timing stage without a live probe)"
  # bounded at 100000s (~28h) — long enough to survive a flappy tunnel
  # must not abort the round's only measurement chain; the end-of-round
  # free_chip.sh tree-kill is the cleanup path either way.
  if timeout 100000 bash scripts/tunnel_watch.sh; then
    echo "[tunnel] up — proceeding"
  else
    echo "[tunnel] still down after ~28h (100000s) — abort (nothing measured)"
    ckpt "post-campaign aborted: tunnel down for ~28h"
    exit 1
  fi

  echo "=== 1. parity gate under the idle-compmin code"
  timeout 5400 python scripts/check_tpu_parity.py || {
    echo "PARITY FAILED — stop; do not measure."
    ckpt "TPU parity gate FAILED under idle-compmin code"
    exit 1; }
  ckpt "TPU parity gate clean under idle-compmin code"

  # The resume chain (on_tunnel_up_resume.sh stages 3.4/3.5) may have
  # already measured peelcount / gateq16 / gateq8 — sweep children are
  # subprocesses, so those rows used the CURRENT (idle-compmin) disk code
  # and need no re-run. The speed/wb16 BASELINE rows predate idle-compmin,
  # so those are always re-measured here (the idle-compmin A/B).
  SPEED_CFGS=$(python - <<'EOF'
import json, os
rows = [json.loads(l) for l in open('bench_out/sweep.jsonl')] \
    if os.path.exists('bench_out/sweep.jsonl') else []
def have(cfg, wb):
    return any(r.get('config') == cfg and r.get('weight_buckets', 0) == wb
               and (r['height'], r['width']) == (1080, 1920) for r in rows)
cfgs = ['baseline'] + [c for c in ['peelcount'] if not have(c, 0)]
print(','.join(cfgs))
EOF
)
  Q_CFGS=$(python - <<'EOF'
import json, os
rows = [json.loads(l) for l in open('bench_out/sweep.jsonl')] \
    if os.path.exists('bench_out/sweep.jsonl') else []
def have(cfg):
    return any(r.get('config') == cfg and r.get('weight_buckets', 0) == 16
               and (r['height'], r['width']) == (1080, 1920) for r in rows)
missing = [c for c in ['gateq16', 'gateq8'] if not have(c)]
print('baseline,' + ','.join(missing) if missing else '')
EOF
)
  echo "=== 2a. speed sweep: $SPEED_CFGS (baseline = idle-compmin A/B)"
  timeout 7200 python scripts/sweep_knobs.py \
      --shapes 1080x1920 --configs "$SPEED_CFGS" || true
  if [ -n "$Q_CFGS" ]; then
    echo "=== 2b. wb16 gate sweep: $Q_CFGS"
    timeout 10800 python scripts/sweep_knobs.py --wb16 \
        --shapes 1080x1920 --configs "$Q_CFGS" || true
  else
    echo "=== 2b. wb16 gate sweep already measured by the resume chain — skip"
  fi
  python scripts/promote_knobs.py \
      --sweep bench_out/sweep.jsonl --out bench_out/promoted_env.sh \
      --names-out bench_out/sweep_winner.json || true
  ckpt "Round-4 queued knob sweeps (idle-compmin baseline, peelcount, gateq16/8)"

  if [ -f bench_out/promoted_env.sh ]; then
    set -a; . bench_out/promoted_env.sh; set +a
    if env | grep -q '^GSEG_'; then
      echo "[campaign env] $(env | grep '^GSEG_' | tr '\n' ' ')"
      echo "=== 2c. 20-seed parity under the promoted env (default-flip license)"
      timeout 5400 python scripts/check_tpu_parity.py --skip-540p \
        && echo "[promoted-env parity] CLEAN" \
        || echo "[promoted-env parity] FAILED — do NOT flip defaults"
      ckpt "Promoted-env parity sweep (round-4 follow-up knobs)"
    fi
  fi

  echo "=== 3. re-measure turbo rungs (final code + campaign env)"
  # Idempotency sentinel (ADVICE r4): the mover below must only quarantine
  # genuinely pre-idle-compmin rows. The first firing leaves the sentinel;
  # re-firings (the runbook is reboot-resumable) skip the move so freshly
  # re-measured rows are never mislabeled as pre-fix data.
  if [ -e bench_out/.preidle_quarantine_done ]; then
    echo "[quarantine] sentinel present — skipping (already ran)"
  else
  python - <<'EOF'
import json
rows = [json.loads(l) for l in open('bench_out/perf.jsonl') if l.strip()]
keep, moved = [], []
for r in rows:
    # plain-turbo rows timed the in-flight pre-idle-compmin process.
    # EXCEPTIONS kept: the 8K row (section_eightk spawns a FRESH
    # subprocess, which imported the new code from disk) and turbo_wb16
    # (re-paying its ~1 h 4K Mosaic compile to refresh a <1% effect —
    # round 1 is one of ~11+ quality rounds — is not worth campaign
    # time; RESULTS_r4 annotates the rows instead).
    stale = r.get('algorithm') == 'turbo' and r.get('height') != 4320
    (moved if stale else keep).append(r)
with open('bench_out/perf_preidle_r4.jsonl', 'a') as f:
    for r in moved:
        f.write(json.dumps(r) + '\n')
with open('bench_out/perf.jsonl', 'w') as f:
    for r in keep:
        f.write(json.dumps(r) + '\n')
print(f"moved {len(moved)} turbo rows to perf_preidle_r4.jsonl")
EOF
  touch bench_out/.preidle_quarantine_done
  fi
  # perf bounded on its own: if a missing wb16 rung (ladder-last) re-enters
  # its multi-hour 4K Mosaic compile and hangs, the cap frees the chain —
  # the turbo rungs before it are checkpointed per rung either way.
  timeout 10800 python scripts/run_evidence.py --sections perf
  # batch (VERDICT item 8): the quarantined r3 batch.jsonl needs a valid
  # successor; runs before the multi-hour 8K gamble so it always lands.
  timeout 7200 python scripts/run_evidence.py --sections batch
  timeout 1800 python scripts/run_evidence.py --sections plots
  ckpt "Turbo rungs re-measured under idle-compmin code (+ promoted env)"

  echo "=== 3.5 4K cost attribution (round-5 planning: where do the"
  echo "        ~420-465 ms go at 4K? peel pieces + per-round costs)"
  timeout 3600 python scripts/probe_pieces.py 2160 3840 \
      > bench_out/probe_pieces_4k.log 2>&1 \
    && echo "[probe] pieces@4K done" || echo "[probe] pieces@4K FAILED/timeout"
  timeout 3600 python scripts/probe_rounds.py 2160 3840 \
      > bench_out/probe_rounds_4k.log 2>&1 \
    && echo "[probe] rounds@4K done" || echo "[probe] rounds@4K FAILED/timeout"
  # fixpoint-call floor decomposition (is the ~4 ms zero-pass overhead
  # pads, scans, or dispatch structure? decides the pad-once-per-stage
  # refactor) at 1080p and 4K:
  timeout 1800 python scripts/probe_floor.py 1080 1920 \
      > bench_out/probe_floor_1080.log 2>&1 \
    && echo "[probe] floor@1080p done" || echo "[probe] floor@1080p FAILED"
  timeout 1800 python scripts/probe_floor.py 2160 3840 \
      > bench_out/probe_floor_4k.log 2>&1 \
    && echo "[probe] floor@4K done" || echo "[probe] floor@4K FAILED"
  ckpt "4K cost attribution probes (round-5 planning data)"

  echo "=== 4. summary"
  python scripts/summarize_evidence.py > docs/EVIDENCE_r4.md 2>/dev/null \
    && echo "[summary] wrote docs/EVIDENCE_r4.md" || true
  ckpt "Evidence summary tables (round 4, post idle-compmin)"

  echo "=== 5. 8K rung LAST (multi-hour Mosaic-compile gamble; everything"
  echo "        above is already checkpointed if this times out)"
  timeout 15000 python scripts/run_evidence.py --sections eightk
  timeout 1800 python scripts/run_evidence.py --sections plots
  python scripts/summarize_evidence.py > docs/EVIDENCE_r4.md 2>/dev/null || true
  ckpt "8K turbo rung on chip (+ refreshed plots/summary)"
} 2>&1 | tee "$LOG"
