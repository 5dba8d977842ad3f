#!/bin/bash
# Round-6 stamp F: final code after the second-pass batch (components
# shared-exchange round + dropped large-star distinct, sig_eq_count
# kernel). Exact driver protocol: sf0.1 input, 8M suite rows, 32 cores.
set -u
LOG=${1:-/root/repo/BENCH/bench_quiet_r6f.log}
{
echo "=== r6f bench $(date -u +%FT%TZ) ==="
echo "loadavg_before: $(cat /proc/loadavg)"
cd /root/repo && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep -E '^\{"metric"' | tail -1
echo "loadavg_after: $(cat /proc/loadavg)"
echo "=== done ==="
} >> "$LOG" 2>&1
