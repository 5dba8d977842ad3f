#!/bin/bash
# Round-5 task 1: quiet-window re-measurement of the 8M driver-protocol bench
# (resolving the r4 -18% headline regression, attributed to ambient load).
# Ambient-load stamped before and after; same protocol as the driver
# (SPARK_GRAFT_SF_DIR=sf0.1, 8M suite rows, warmup + 3 timed runs, median).
set -u
LOG=${1:-/root/repo/BENCH/bench_quiet_r5.log}
{
echo "=== quiet-window bench $(date -u +%FT%TZ) ==="
uptime
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 /tmp/graft_run.sh graft.Bench 2>/dev/null | tail -1
echo "--- after $(date -u +%FT%TZ) ---"
uptime
echo "=== done ==="
} >> "$LOG" 2>&1
