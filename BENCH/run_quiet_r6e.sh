#!/bin/bash
# Round-6 stamp A: after the scan-count/kernel optimization batch.
set -u
LOG=${1:-/root/repo/BENCH/bench_quiet_r6e.log}
{
echo "=== r6e bench $(date -u +%FT%TZ) ==="
echo "loadavg_before: $(cat /proc/loadavg)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 /tmp/graft_run.sh graft.Bench 2>/dev/null | tail -1
echo "loadavg_after: $(cat /proc/loadavg)"
echo "=== done ==="
} >> "$LOG" 2>&1
