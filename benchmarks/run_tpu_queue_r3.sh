#!/bin/bash
# Round-3 TPU measurement queue (run when the relay is back):
#   1. headline bench sanity (flagship throughput unchanged by round-3 work)
#   2. DMA-issue asymptote probe (VERDICT item 3: rows/s vs DMA height R +
#      dual-array strided writes)
#   3. serving/inference baseline rows (VERDICT item 6)
#   4. current 40M x 32 pallas step number for the same-window comparison
# Logs land in /tmp/tpuq3_*.log.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "/tmp/tpuq3_${name}.log" 2>&1
  tail -4 "/tmp/tpuq3_${name}.log"
}

run headline python bench.py
run dma_floor python benchmarks/probe_dma_issue_floor.py
MOMENT_DTYPE=bfloat16 SCAN_STEPS=16 run ab_40m python benchmarks/bench_40m_table_update.py pallas
run inference python benchmarks/bench_inference.py
echo "=== round-3 queue done ==="
