#!/bin/bash
# Round-6 BASELINE stamp: round-5 end-of-round code, driver protocol
# (sf0.1 input, 8M suite rows, full-size warm-up + 3 timed runs).
set -u
LOG=${1:-/root/repo/BENCH/bench_quiet_r6_baseline.log}
{
echo "=== r6 baseline bench $(date -u +%FT%TZ) ==="
echo "loadavg_before: $(cat /proc/loadavg)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 /tmp/graft_run.sh graft.Bench 2>/dev/null | tail -1
echo "loadavg_after: $(cat /proc/loadavg)"
echo "--- after $(date -u +%FT%TZ) ---"
echo "=== done ==="
} >> "$LOG" 2>&1
