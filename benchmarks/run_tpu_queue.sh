#!/bin/bash
# Post-outage measurement queue: validates the current head (fused-scatter
# prep + write-only kernel + scan) end-to-end and re-runs the probes whose
# sync chains were fixed.  Logs land in /tmp/tpuq_*.log.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "/tmp/tpuq_${name}.log" 2>&1
  grep -E "metric|x vs|round 4|unique of|chunk|correctness|alive" \
    "/tmp/tpuq_${name}.log" | tail -8
}

MOMENT_DTYPE=bfloat16 run ab_chained python benchmarks/bench_40m_table_update.py scatter pallas
MOMENT_DTYPE=bfloat16 SCAN_STEPS=16 run ab_scan python benchmarks/bench_40m_table_update.py pallas
MOMENT_DTYPE=bfloat16 ZIPF=1.1 SCAN_STEPS=16 run ab_zipf python benchmarks/bench_40m_table_update.py pallas
run chunk_sweep python benchmarks/probe_kernel_chunk.py
run headline python bench.py
echo "=== queue done ==="
