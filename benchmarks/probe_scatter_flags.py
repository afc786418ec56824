"""Does telling XLA that scatter indices are unique/sorted unlock a faster
scatter path on this backend?

The two-phase SparseAdam step can provide BOTH guarantees for free: batch
composition is host-known, so the host can emit the batch's unique physical
rows in sorted order (padding with an untouched row).  If
`unique_indices=True` (+ `indices_are_sorted=True`) makes XLA's scatter-add
approach the gather's ~17 ns/row DMA speed, no Pallas kernel is needed.

Composite programs (leading gather) as in probe_scatter_cost.py.
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
    """Sync on EVERY output leaf (a scalar slice each): reading only one
    leaf can complete before the other outputs' work drains (PJRT outputs
    become ready individually)."""
    def sync(out):
        for leaf in jax.tree_util.tree_leaves(out):
            float(np.asarray(leaf.ravel()[0]))
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    V_rows, K = 2_500_000, 65_536
    rng = np.random.RandomState(0)
    ids_unique = np.sort(rng.permutation(V_rows)[:K]).astype(np.int32)
    ids = jnp.asarray(ids_unique)
    table = jnp.asarray(rng.rand(V_rows, 128).astype(np.float32))
    mu = jnp.asarray(rng.rand(V_rows, 128).astype(np.float32))
    nu = jnp.asarray(rng.rand(V_rows, 128).astype(np.float32))
    d1 = jnp.asarray(rng.randn(K, 128).astype(np.float32))
    d2 = jnp.asarray(rng.randn(K, 128).astype(np.float32))
    d3 = jnp.asarray(rng.randn(K, 128).astype(np.float32))

    @jax.jit
    def gather_only(table, ids, d1):
        return jnp.sum(jnp.take(table, ids, axis=0) * d1)

    def make(unique, sorted_):
        @jax.jit
        def f(table, mu, nu, ids, d1, d2, d3):
            rows = jnp.take(table, ids, axis=0)
            kw = dict(unique_indices=unique, indices_are_sorted=sorted_)
            return (
                table.at[ids].add(d1, **kw),
                mu.at[ids].add(d2, **kw),
                nu.at[ids].add(d3, **kw),
                jnp.sum(rows),
            )
        return f

    tg = chain_time(gather_only, (table, ids, d1))
    print(f"gather floor             {tg*1e3:8.2f} ms")
    for unique, sorted_ in [(False, False), (True, False), (True, True)]:
        f = make(unique, sorted_)
        t = chain_time(f, (table, mu, nu, ids, d1, d2, d3))
        print(
            f"3x scatter unique={int(unique)} sorted={int(sorted_)}: "
            f"{t*1e3:8.2f} ms  (scatter {(t-tg)/3/K*1e9:6.1f} ns/row per)"
        )


if __name__ == "__main__":
    main()
