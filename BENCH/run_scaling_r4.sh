#!/bin/bash
# Round-4 paired scaling block: 288M rows — the deepest rung that fits this
# sandbox's disk (thin-provisioned: ~94 GB real capacity despite df's 252 GB).
# Measured at 320M: ONE run's scratch (disk-cached slim projection overflow
# ~18 GB + live shuffle files ~13+ GB) plus the 45 GB input dies ENOSPC
# mid-warm-up; 288M under the lz4 default ALSO died ENOSPC twice — the rung
# fits only with zstd shuffle/spill compression (set in ProfileSuite) plus
# the 60%-shrunk cached projection. 512M (72 GB + scratch) was never close.
# 8 vs 32 cores, 3 timed runs per level after a full-size JIT warm-up,
# same-day CpuProbe ceiling stamps before and after, ambient-load stamps
# before each leg (the shared-VM protocol in BENCH/BASELINE.md).
set -u
set -o pipefail
LOG=${1:-/root/repo/BENCH/scaling_288m_r4.log}
ROWS=288000000
INPUT=/tmp/graft_bench_input_$ROWS
RUN=/tmp/graft_run.sh
{
echo "=== round-4 scaling block $(date -u +%FT%TZ) ==="
echo "--- generate (idempotent) ---"; uptime; df -h / | tail -1
SPARK_GRAFT_SUITE_ROWS=$ROWS $RUN graft.GenBenchInput 2>/dev/null | tail -1
du -sh $INPUT; df -h / | tail -1
for c in 8 32; do
  echo "--- CpuProbe cpus=$c $(date -u +%FT%TZ) ---"; uptime
  SPARK_GRAFT_CPUS=$c $RUN graft.CpuProbe 2>/dev/null | tail -1
done
for c in 8 32; do
  echo "--- ProfileSuite cpus=$c $(date -u +%FT%TZ) ---"; uptime; df -h / | tail -1
  SPARK_GRAFT_CPUS=$c SPARK_GRAFT_INPUT=$INPUT SPARK_GRAFT_PROBE_RUNS=3 \
    $RUN graft.ProfileSuite 2>/tmp/scaling_leg_$c.err | tail -1 \
    || { echo "LEG cpus=$c FAILED — stderr tail:"; tail -3 /tmp/scaling_leg_$c.err; }
  rm -rf /tmp/prof*
done
echo "--- CpuProbe re-stamp after block $(date -u +%FT%TZ) ---"; uptime
for c in 8 32; do
  SPARK_GRAFT_CPUS=$c $RUN graft.CpuProbe 2>/dev/null | tail -1
done
echo "=== done $(date -u +%FT%TZ) ==="
} >> "$LOG" 2>&1
