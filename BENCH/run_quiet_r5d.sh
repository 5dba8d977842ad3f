#!/bin/bash
# Round-5 FOURTH stamped bench: end-of-round code — adds the
# q_group_drift_8m leg (stratified per-lang drift over the 8M suite
# input). Same driver protocol: sf0.1 input, 8M suite rows,
# full-size warm-up + 3 timed runs inside graft.Bench.
set -u
LOG=${1:-/root/repo/BENCH/bench_quiet_r5d.log}
{
echo "=== r5d bench $(date -u +%FT%TZ) ==="
uptime
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 /tmp/graft_run.sh graft.Bench 2>/dev/null | tail -1
echo "--- after $(date -u +%FT%TZ) ---"
uptime
echo "=== done ==="
} >> "$LOG" 2>&1
