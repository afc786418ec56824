#!/bin/bash
# Round-3 second TPU queue (run when the relay is back):
#   1. relay sanity (trivial matmul, fast-fail)
#   2. 40M split-vs-stacked container A/B, same window (the dual strided
#      write kernel: expected ~-0.5 ms/step on the 1.40 ms write stage)
#   3. scan-amortized dedup-scatter cost (decides the fused
#      accumulate+write kernel: stage-removal said 28 ns/row, the gather
#      lesson says that may be mostly dependency stall)
#   4. headline bench sanity
# Logs land in /tmp/tpuq3b_*.log.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "/tmp/tpuq3b_${name}.log" 2>&1
  tail -3 "/tmp/tpuq3b_${name}.log"
}

timeout 180 python -c "
import jax, numpy as np, jax.numpy as jnp
print(float(np.asarray((jnp.ones((64,64))@jnp.ones((64,64))).ravel()[0])))
" || { echo 'relay still dead'; exit 1; }

MOMENT_DTYPE=bfloat16 SCAN_STEPS=16 run ab_split python benchmarks/bench_40m_table_update.py pallas
MOMENT_DTYPE=bfloat16 SCAN_STEPS=16 TABLE_CONTAINER=stacked run ab_stacked python benchmarks/bench_40m_table_update.py pallas
run scatter_scan python benchmarks/probe_scatter_scan.py
# floor share at 10 GB state is ~0.39 ms/step under scan16 — scan32 halves it
MOMENT_DTYPE=bfloat16 SCAN_STEPS=32 run ab_stacked32 python benchmarks/bench_40m_table_update.py pallas
MOMENT_DTYPE=bfloat16 SCAN_STEPS=16 ZIPF=1.1 TABLE_CONTAINER=stacked run ab_stacked_zipf python benchmarks/bench_40m_table_update.py pallas
run headline python bench.py
echo "=== round-3b queue done ==="
