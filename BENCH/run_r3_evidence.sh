#!/bin/bash
# Round-3 performance-evidence pipeline (VERDICT items 1 + 2):
#   1. wait (bounded) for a clean host window — L2 compute probe >= 0.88;
#   2. re-measure the full headline bench in that window (the round-2
#      -18% transcripts regression must be confirmed or exonerated in a
#      clean window, per VERDICT "Next round" item 1);
#   3. hand the box to the paired scaling campaign until it banks
#      SUCCESS_PAIRS qualifying pairs since the post-rewrite epoch
#      (--since 1787108000 = 08-19 03:15, the single-WindowExec ordered
#      pass landing) or is stopped via BENCH/STOP_CAMPAIGN.
# Never run any other Spark session while this is alive (CLAUDE.md).
set -u
cd /root/repo

echo "[r3] phase 1: waiting for clean window ($(date -u +%H:%M:%S))"
for i in $(seq 45); do
  clean=$(python BENCH/host_probe.py 2>/dev/null | python -c "
import sys, json
try:
    d = json.loads(sys.stdin.readline())
    print(1 if d.get('compute_eff', 0) >= 0.88 else 0, d)
except Exception as e:
    print(1, 'probe-broken', e)  # a broken probe must never block
")
  echo "[r3] probe $i: $clean"
  case "$clean" in 1*) break;; esac
  sleep 100
done

echo "[r3] phase 2: headline bench ($(date -u +%H:%M:%S))"
python bench.py > /tmp/bench_headline_r3.json 2> /tmp/bench_headline_r3.err
echo "[r3] headline: $(cat /tmp/bench_headline_r3.json)"

echo "[r3] phase 3: campaign ($(date -u +%H:%M:%S))"
python BENCH/campaign.py --max-iters 10 --pairs-per-iter 3 --since 1787108000
echo "[r3] done ($(date -u +%H:%M:%S))"
