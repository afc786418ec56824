"""Isolate the per-row cost of gather vs scatter on the big-table path.

The two-phase embedding step at 10M-40M rows spends its time in the
65k-row gather + scatter-update path (docs/perf_notes.md, ~300 ns/row
observed end-to-end vs 17 ns/row for the packed gather fast path).  This
probe times, inside composite programs (scatter as the MAIN op pays a
fixed ~27 ms dispatch on this backend, so every variant carries a gather
and a cheap reduce):

  G   : gather K rows                      -> per-row gather cost
  GS  : gather + scatter-add K rows        -> GS - G = scatter-add cost
  GS3 : gather + 3x scatter (row update + 2 moment updates, the SparseAdam
        write pattern)                     -> incremental per-scatter cost

Table layouts: packed [V/P, 128] (the production layout at this size) and
plain [V, 32].  Chain-synced timing (scalar readback), best-of-N.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(fn, args, iters=8):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.ravel()[0]))  # warm + sync
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    V, D, K = 10_000_000, 32, 65_536
    P = 128 // D
    rows_packed = V // P

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, rows_packed, K, dtype=np.int64).astype(np.int32))
    table = jnp.asarray(rng.rand(rows_packed, 128).astype(np.float32))
    upd = jnp.asarray(rng.rand(K, 128).astype(np.float32))

    @jax.jit
    def g(table, ids, upd):
        rows = jnp.take(table, ids, axis=0)
        return jnp.sum(rows * upd)

    @jax.jit
    def gs(table, ids, upd):
        rows = jnp.take(table, ids, axis=0)
        new = table.at[ids].add(rows * 0.001 + upd)
        return new, jnp.sum(rows)

    @jax.jit
    def gs3(table, ids, upd):
        rows = jnp.take(table, ids, axis=0)
        a = table.at[ids].add(upd)
        b = a.at[ids].mul(0.999)
        c = b.at[ids].add(rows * 0.001)
        return c, jnp.sum(rows)

    tg = chain_time(g, (table, ids, upd))
    tgs = chain_time(gs, (table, ids, upd))
    tgs3 = chain_time(gs3, (table, ids, upd))
    print(f"packed [{rows_packed}x128] K={K}")
    print(f"  G    {tg*1e3:8.2f} ms   ({tg/K*1e9:6.1f} ns/row)")
    print(f"  GS   {tgs*1e3:8.2f} ms   (scatter-add: {(tgs-tg)/K*1e9:6.1f} ns/row)")
    print(f"  GS3  {tgs3*1e3:8.2f} ms   (per extra scatter: {(tgs3-tgs)/2/K*1e9:6.1f} ns/row)")

    # plain [V, 32] for comparison (the narrow-row regime)
    table32 = jnp.asarray(rng.rand(V, D).astype(np.float32))
    ids_v = jnp.asarray(rng.randint(0, V, K, dtype=np.int64).astype(np.int32))
    upd32 = jnp.asarray(rng.rand(K, D).astype(np.float32))
    tg2 = chain_time(g, (table32, ids_v, upd32))
    tgs2 = chain_time(gs, (table32, ids_v, upd32))
    print(f"plain [{V}x{D}]")
    print(f"  G    {tg2*1e3:8.2f} ms   ({tg2/K*1e9:6.1f} ns/row)")
    print(f"  GS   {tgs2*1e3:8.2f} ms   (scatter-add: {(tgs2-tg2)/K*1e9:6.1f} ns/row)")


if __name__ == "__main__":
    main()
