#!/bin/bash
# Round-5 second stamped bench: NEW code (native IVF exprs, q_ann_ivf in
# headlines). Same driver protocol.
set -u
LOG=${1:-/root/repo/BENCH/bench_quiet_r5b.log}
{
echo "=== r5b bench $(date -u +%FT%TZ) ==="
uptime
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 /tmp/graft_run.sh graft.Bench 2>/dev/null | tail -1
echo "--- after $(date -u +%FT%TZ) ---"
uptime
echo "=== done ==="
} >> "$LOG" 2>&1
