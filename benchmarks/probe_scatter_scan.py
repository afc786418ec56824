"""Scan-amortized XLA scatter-add cost at the 40M-step dedup shape.

The round-2 stage decomposition attributed 1.83 ms (~28 ns/row) to the
merged [Kp, 2W] int32 dedup scatter — but stage-removal attributes WAIT
time to whichever op waits (the monu gather's 1.33 ms collapsed to
0.58 ms standalone under the scan-amortized discipline,
probe_row_gather_scan.py).  This measures the scatter alone, floor-
cancelled, to size the headroom of replacing it with a fused
accumulate+write pallas kernel:

  merged   zeros[Kp, 256] i32 .at[pinv].add(contrib [K, 256])  (today)
  batched  zeros[2, Kp, 128] i32 .at[:, pinv].add([2, K, 128]) (the
           stacked-container layout round 3 introduced)
  base     the contrib+carry elementwise work alone, no scatter

Fresh pinv per scan step; N=16 vs 32 marginal.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = int(os.environ.get("K", 65536))
Kp = int(os.environ.get("KP", 65536))
ITERS = int(os.environ.get("ITERS", 8))
NS = (16, 32)


def run_scanned(body, contrib, pinv_all):
    import jax
    import jax.numpy as jnp

    times = {}
    for n_scan in NS:
        pa = jnp.asarray(pinv_all[:n_scan])

        @jax.jit
        def prog(contrib, pa):
            def step(c, pinv):
                acc = body(contrib + c.astype(contrib.dtype), pinv)
                return acc.ravel()[0], None

            c, _ = jax.lax.scan(step, jnp.int32(0), pa)
            return c

        c = prog(contrib, pa)
        float(np.asarray(c))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                c = prog(contrib + c - c, pa)
            float(np.asarray(c))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        times[n_scan] = best
    return (times[NS[1]] - times[NS[0]]) / (NS[1] - NS[0]), times


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    pinv_all = np.stack(
        [rng.integers(0, Kp, K).astype(np.int32) for _ in range(NS[1])])
    contrib = jnp.asarray(
        rng.integers(-1000, 1000, (K, 256)).astype(np.int32))
    contrib_b = jnp.asarray(np.stack(
        [np.asarray(contrib)[:, :128], np.asarray(contrib)[:, 128:]]))

    results = {}

    def merged(c, pinv):
        return jnp.zeros((Kp, 256), jnp.int32).at[pinv].add(c)

    def batched(c, pinv):
        return jnp.zeros((2, Kp, 128), jnp.int32).at[:, pinv].add(c)

    def base(c, pinv):
        return c + pinv[0]

    for name, body, arg in (("merged", merged, contrib),
                            ("batched", batched, contrib_b),
                            ("base", base, contrib)):
        marginal, times = run_scanned(body, arg, pinv_all)
        ns_row = marginal / K * 1e9
        results[name] = ns_row
        print(f"[{name:7s}] t16={times[16]*1e3:8.3f} ms "
              f"t32={times[32]*1e3:8.3f} ms  marginal {marginal*1e3:6.3f} ms"
              f"  {ns_row:6.1f} ns/row", flush=True)

    print(json.dumps({"metric": "dedup_scatter_scan_ns_per_row",
                      "K": K, "Kp": Kp,
                      **{k: round(v, 1) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
