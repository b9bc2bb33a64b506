#!/bin/bash
# End-of-round chip release: kill any still-running campaign process TREES
# (by explicit pidfile — NEVER by name/pattern) so the driver's bench.py
# gets the TPU. Round-3 lost its headline (BENCH_r03 rc=1) to exactly this.
#
# Usage: free_chip.sh [pidfile ...]   (defaults to the round-4 chain files)
set -u
FILES=("$@")
[ ${#FILES[@]} -eq 0 ] && FILES=(/tmp/tunnel_chain.pid /tmp/post_campaign.pid
                                 /tmp/post_campaign_run.pid)

kids() {  # all descendant pids of $1, depth-first
  local p
  for p in $(cat /proc/$1/task/*/children 2>/dev/null); do
    kids "$p"
    echo "$p"
  done
}

for f in "${FILES[@]}"; do
  [ -f "$f" ] || continue
  pid=$(cat "$f" 2>/dev/null)
  [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null || continue
  tree="$(kids "$pid") $pid"
  echo "[free_chip] $f -> killing tree: $tree"
  kill -TERM $tree 2>/dev/null
  sleep 10
  kill -KILL $tree 2>/dev/null
done
echo "[free_chip] done $(date -u +%FT%TZ)"
