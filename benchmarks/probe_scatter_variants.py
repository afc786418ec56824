"""Scatter-add variants for the SparseAdam row-update path.

probe_scatter_cost.py showed the packed-table scatter-add costs
~85-190 ns/row vs ~17 ns/row for the gather fast path.  The host already
knows each batch's composition (two-phase dedup metadata), so it CAN
present indices sorted and unique.  This probe measures what that buys:

  base   : table.at[ids].add(upd)                       (status quo)
  sorted : ids pre-sorted, indices_are_sorted=True
  uniq   : sorted + unique ids, unique_indices=True     (legal: host dedups)
  small  : scatter-add into a [K, 128] buffer           (dedup-buffer cost)
  rmw    : gather rows + add + .at[].set(unique sorted) (read-modify-write
           spelled as gather+set instead of scatter-add)

All programs carry a leading gather + reduce so scatter is not the lone op
(27 ms standalone-dispatch penalty).  Chain-synced, best-of-N.
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
    float(np.asarray(leaf.ravel()[0]))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    V_rows, K = 2_500_000, 65_536  # packed 10M x 32 -> [2.5M, 128]
    rng = np.random.RandomState(0)
    ids_np = rng.randint(0, V_rows, K, dtype=np.int64).astype(np.int32)
    ids = jnp.asarray(ids_np)
    ids_sorted = jnp.asarray(np.sort(ids_np))
    uniq_np = np.unique(ids_np)  # ~64.7k of 65.5k unique at this V
    pad = K - len(uniq_np)
    uniq_sorted = jnp.asarray(
        np.concatenate([uniq_np, np.full(pad, V_rows - 1, np.int32)])
    )
    table = jnp.asarray(rng.rand(V_rows, 128).astype(np.float32))
    upd = jnp.asarray(rng.rand(K, 128).astype(np.float32))
    small_pos = jnp.asarray((ids_np % K).astype(np.int32))

    @jax.jit
    def base(table, ids, upd):
        rows = jnp.take(table, ids, axis=0)
        return table.at[ids].add(upd), jnp.sum(rows)

    @jax.jit
    def sorted_add(table, ids, upd):
        rows = jnp.take(table, ids, axis=0)
        return table.at[ids].add(upd, indices_are_sorted=True), jnp.sum(rows)

    @jax.jit
    def uniq_add(table, ids, upd):
        rows = jnp.take(table, ids, axis=0)
        return (
            table.at[ids].add(upd, indices_are_sorted=True, unique_indices=True),
            jnp.sum(rows),
        )

    @jax.jit
    def small(table, ids, upd, pos):
        rows = jnp.take(table, ids, axis=0)
        buf = jnp.zeros((K, 128), jnp.float32).at[pos].add(upd)
        return buf, jnp.sum(rows)

    @jax.jit
    def rmw_set(table, ids, upd):
        rows = jnp.take(table, ids, axis=0)
        return (
            table.at[ids].set(rows + upd, indices_are_sorted=True,
                              unique_indices=True),
            jnp.sum(rows),
        )

    tg = chain_time(jax.jit(lambda t, i, u: jnp.sum(jnp.take(t, i, axis=0) * u)),
                    (table, ids, upd))
    print(f"[{V_rows}x128] K={K}   gather-only floor {tg*1e3:.2f} ms")
    for name, fn, args in [
        ("base      ", base, (table, ids, upd)),
        ("sorted    ", sorted_add, (table, ids_sorted, upd)),
        ("uniq+sort ", uniq_add, (table, uniq_sorted, upd)),
        ("small-buf ", small, (table, ids, upd, small_pos)),
        ("rmw-set   ", rmw_set, (table, uniq_sorted, upd)),
    ]:
        t = chain_time(fn, args)
        print(f"  {name} {t*1e3:8.2f} ms   (scatter part: {(t-tg)/K*1e9:6.1f} ns/row)")


if __name__ == "__main__":
    main()
