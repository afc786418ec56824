"""Does ONE [K, 256] accumulation scatter beat TWO [K, 128] scatters?

The folded 40M-row opt-prep runs two duplicate-index scatter-adds into
small [Kp, 128] buffers (f32 table contribs + int32 monu contribs) —
measured +4.58 ms of the 5.9 ms step (probe_40m_step_stages.py, round 2).
If scatter cost here is per-ROW (DMA-issue) rather than per-byte, a single
[K, 256] scatter halves the dominant opt-prep cost and motivates the
exclusive-lane-ownership fold (one int32 contributor per lane).  Composite
programs (a big gather keeps the scatter off the lone-op ~27 ms dispatch
floor), chain-synced, same window.
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
    V, K = 10_000_000, 65_536
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.rand(V, 128).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V, K).astype(np.int32))
    # duplicate-bearing accumulation indices, like pinv (K -> Kp ~ K slots)
    pinv = jnp.asarray(np.sort(rng.randint(0, K, K)).astype(np.int32))
    c128a = jnp.asarray(rng.randn(K, 128).astype(np.float32))
    c128b = jnp.asarray(rng.randn(K, 128).astype(np.float32))
    c256 = jnp.concatenate([c128a, c128b], axis=1)
    c256i = jax.lax.bitcast_convert_type(c256, jnp.int32)

    def bench(name, f, *args):
        g = jax.jit(f)
        out = g(*args)
        for o in jax.tree_util.tree_leaves(out):
            float(np.asarray(o.ravel()[0]))
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            out = g(*args)
            for o in jax.tree_util.tree_leaves(out):
                float(np.asarray(o.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s} {best*1e3:7.2f} ms", flush=True)
        return best

    def gather_only(table, ids):
        return jnp.take(table, ids, axis=0).sum()

    def two_128(table, ids, pinv, a, b):
        rows = jnp.take(table, ids, axis=0)
        acc_a = jnp.zeros((K, 128), jnp.float32).at[pinv].add(a)
        acc_b = jnp.zeros((K, 128), jnp.float32).at[pinv].add(b)
        return rows.sum(), acc_a, acc_b

    def one_256_f32(table, ids, pinv, c):
        rows = jnp.take(table, ids, axis=0)
        acc = jnp.zeros((K, 256), jnp.float32).at[pinv].add(c)
        return rows.sum(), acc

    def one_256_i32(table, ids, pinv, ci):
        rows = jnp.take(table, ids, axis=0)
        acc = jnp.zeros((K, 256), jnp.int32).at[pinv].add(ci)
        return rows.sum(), acc

    t_g = bench("gather only (floor)", gather_only, table, ids)
    t2 = bench("two [K,128] f32 scatters", two_128, table, ids, pinv,
               c128a, c128b)
    t1f = bench("one [K,256] f32 scatter", one_256_f32, table, ids, pinv,
                c256)
    t1i = bench("one [K,256] i32 scatter", one_256_i32, table, ids, pinv,
                c256i)
    print(f"beyond gather floor: two128 {1e3*(t2-t_g):.2f}  "
          f"one256f {1e3*(t1f-t_g):.2f}  one256i {1e3*(t1i-t_g):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
