#!/bin/bash
# Round-6 stamp L: clean-window re-stamp (steal probe 0.1% at launch; loadavg_before is the probe spin decaying, guest otherwise idle) of the final committed
# code (no code delta vs r6f). Exact driver protocol: sf0.1 input,
# 8M suite rows, 32 cores.
set -u
LOG=${1:-/root/repo/BENCH/bench_quiet_r6l.log}
{
echo "=== r6l bench $(date -u +%FT%TZ) ==="
echo "loadavg_before: $(cat /proc/loadavg)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep -E '^\{"metric"' | tail -1
echo "loadavg_after: $(cat /proc/loadavg)"
echo "=== done ==="
} >> "$LOG" 2>&1
