#!/bin/bash
# Round close-out ritual — produces the two self-run artifacts the driver's
# flaky tail/zeroing cannot blank (VERDICT r12 #1 / r11 bench directive):
#
#   correctness_r<N>_final.json — graft.Verify at sf0.01 (driver parity:
#       local[4]) + tools/check_oracle.py per-query map
#   bench_r<N>_final.json       — graft.Bench full sweep at sf0.1
#
# Usage: tools/closeout.sh <roundN>   (run AFTER `sbt compile`; uses
# run_main.sh so a held sbt lock doesn't block it)
set -euo pipefail
cd "$(dirname "$0")/.."
N="$1"
VOUT=$(mktemp -d /tmp/verify_close_XXXX)

echo "== Verify @ sf0.01 (local[4]) =="
SPARK_GRAFT_CPUS=4 tools/run_main.sh graft.Verify /root/testdata/sf0.01 "$VOUT" \
  2> >(grep -E 'verify-time|LINT|failed' >&2 || true)

echo "== DuckDB oracle compare =="
python3 tools/check_oracle.py /root/testdata/sf0.01 "$VOUT" \
  --json "correctness_r${N}_final.json" | tail -3

echo "== Bench sweep @ sf0.1 =="
# Bench's LAST stdout line is now a short summary (driver tail-capture
# fix); the full per-query JSON is written to $SPARK_GRAFT_BENCH_OUT.
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT="bench_r${N}_final.json" \
  tools/run_main.sh graft.Bench | tail -1
python3 -c "import json; d=json.load(open('bench_r${N}_final.json')); print('total', d['value'], 's /', len(d['queries']), 'queries')"

# Canary-normalized round-over-round adjudication (VERDICT r13 #5): scale
# pairwise ratios by the box-speed canary ratio before flagging, so a
# contended close-out box stops generating phantom regressions.
PREV="bench_r$((N - 1))_final.json"
if [ -f "$PREV" ]; then
  echo "== Canary-normalized compare vs $PREV =="
  python3 tools/bench_compare.py "$PREV" "bench_r${N}_final.json" \
    --json "bench_compare_r${N}.json" || true
fi

# Machine-readable anchor ledger (VERDICT r14 #7): adjudicate THIS sweep
# against the recorded quiet anchors (per-query canary normalization),
# then fold the sweep in as the new anchors — anchors.py refuses a
# contended sweep (canary >1.25x the ledger's reference) so a hot box
# cannot poison the ledger.
if [ -f anchors.json ]; then
  echo "== Compare vs anchor ledger =="
  python3 tools/bench_compare.py anchors.json "bench_r${N}_final.json" \
    --json "bench_vs_anchors_r${N}.json" || true
fi
echo "== Anchor ledger update =="
python3 tools/anchors.py update anchors.json "bench_r${N}_final.json" --round "r${N}" || true

echo "artifacts: correctness_r${N}_final.json bench_r${N}_final.json bench_compare_r${N}.json bench_vs_anchors_r${N}.json anchors.json — commit them"
