"""Scatter-add cost WITH buffer donation (the real train-step situation).

probe_scatter_variants.py measured ~175-185 ns/row for big-table
scatter-adds but 12.6 ns/row into a fresh [K, 128] buffer — consistent
with the un-donated table input forcing a full-table copy per iteration.
The train step donates its state, so this probe re-measures with
donate_argnums: if donated scatter-adds are cheap, the large-table step's
~20 ms is NOT the scatter itself and the fused-RMW kernel has less to win.

Ping-pongs two donated buffers (donation consumes the input each call).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    V_rows, K = 2_500_000, 65_536
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, V_rows, K, dtype=np.int64).astype(np.int32))
    upd = jnp.asarray(rng.rand(K, 128).astype(np.float32))

    @jax.jit
    def gather_only(table, ids, upd):
        return jnp.sum(jnp.take(table, ids, axis=0) * upd)

    def scatter1(table, ids, upd):
        rows = jnp.take(table, ids, axis=0)
        return table.at[ids].add(upd), jnp.sum(rows)

    def scatter3(table, mu, nu, ids, upd):
        rows = jnp.take(table, ids, axis=0)
        return (
            table.at[ids].add(upd),
            mu.at[ids].add(upd),
            nu.at[ids].add(upd),
            jnp.sum(rows),
        )

    s1 = jax.jit(scatter1, donate_argnums=(0,))
    s3 = jax.jit(scatter3, donate_argnums=(0, 1, 2))

    table = jnp.asarray(rng.rand(V_rows, 128).astype(np.float32))
    tg = None
    best = float("inf")
    gather_only(table, ids, upd)
    for _ in range(6):
        t0 = time.perf_counter()
        float(np.asarray(gather_only(table, ids, upd)))
        best = min(best, time.perf_counter() - t0)
    tg = best
    print(f"gather floor {tg*1e3:.2f} ms")

    # donated single scatter: table is consumed and returned each call
    best = float("inf")
    table, chk = s1(table, ids, upd)  # warm
    for _ in range(8):
        t0 = time.perf_counter()
        table, chk = s1(table, ids, upd)
        float(np.asarray(chk))
        float(np.asarray(table.ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"donated 1x scatter-add: {best*1e3:8.2f} ms  "
          f"(scatter part {(best-tg)/K*1e9:6.1f} ns/row)")

    mu = jnp.asarray(rng.rand(V_rows, 128).astype(np.float32))
    nu = jnp.asarray(rng.rand(V_rows, 128).astype(np.float32))
    table2 = jnp.asarray(rng.rand(V_rows, 128).astype(np.float32))
    table2, mu, nu, chk = s3(table2, mu, nu, ids, upd)
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        table2, mu, nu, chk = s3(table2, mu, nu, ids, upd)
        float(np.asarray(chk))
        float(np.asarray(table2.ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"donated 3x scatter-add: {best*1e3:8.2f} ms  "
          f"(scatter part {(best-tg)/3/K*1e9:6.1f} ns/row per scatter)")


if __name__ == "__main__":
    main()
