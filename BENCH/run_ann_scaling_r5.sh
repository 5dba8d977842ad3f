#!/bin/bash
# Round-5 ANN-family paired scaling block: IVF assignment / PQ encode / ADC
# search at 8 vs 32 threads over the same 8M x dim-64 corpus, CpuProbe
# ceiling stamps before and after, ambient-load stamps per leg (the
# BENCH/BASELINE.md protocol).
set -u
LOG=${1:-/root/repo/BENCH/ann_scaling_r5.log}
RUN=/tmp/graft_run.sh
{
echo "=== ann scaling block $(date -u +%FT%TZ) ==="
for c in 8 32; do
  echo "--- CpuProbe cpus=$c $(date -u +%FT%TZ) ---"; uptime
  SPARK_GRAFT_CPUS=$c $RUN graft.CpuProbe 2>/dev/null | tail -1
done
for c in 8 32; do
  echo "--- AnnScaleProbe cpus=$c $(date -u +%FT%TZ) ---"; uptime
  SPARK_GRAFT_CPUS=$c SPARK_GRAFT_PROBE_RUNS=3 $RUN graft.AnnScaleProbe 2>/dev/null | tail -1
done
echo "--- CpuProbe re-stamp $(date -u +%FT%TZ) ---"; uptime
for c in 8 32; do
  SPARK_GRAFT_CPUS=$c $RUN graft.CpuProbe 2>/dev/null | tail -1
done
echo "=== done $(date -u +%FT%TZ) ==="
} >> "$LOG" 2>&1
