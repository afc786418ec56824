"""Chunk-size sweep for the rows-RMW kernel (packed-moment configuration:
table add + monu masked-set, 4 row DMAs/id), same window.

Larger chunks amortize grid overhead but serialize longer read->compute->
write phases (no cross-chunk overlap inside the kernel body); this measures
where the knee is.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mmlrec_tpu.ops.pallas_scatter import pallas_rows_update


def main():
    V, K = 2_500_000, 65_536
    rng = np.random.RandomState(0)
    ids = jnp.asarray(np.sort(rng.permutation(V)[:K]).astype(np.int32))
    table = jnp.asarray(rng.rand(V, 128).astype(np.float32))
    monu = jnp.asarray(rng.rand(V, 128).astype(np.float32))
    d_t = jnp.asarray(rng.randn(K, 128).astype(np.float32))
    vals = jnp.asarray(rng.rand(K, 128).astype(np.float32))
    mask = jnp.asarray((rng.rand(K, 128) > 0.5).astype(np.float32))

    results = {}
    for chunk in (64, 128, 256, 512):
        @jax.jit
        def f(table, monu, ids, d_t, vals, mask, chunk=chunk):
            rows = jnp.take(table, ids, axis=0)
            t, m = pallas_rows_update(
                (table, monu), ids, (d_t, vals), modes=("add", "set"),
                masks=(None, mask), chunk=chunk)
            return t, m, jnp.sum(rows)

        def sync(out):
            # sync on the KERNEL outputs, not just the gather sum —
            # PJRT outputs become ready individually
            for o in out:
                float(np.asarray(o.ravel()[0]))
        out = f(table, monu, ids, d_t, vals, mask)
        sync(out)
        best = float("inf")
        for _ in range(8):
            del out
            t0 = time.perf_counter()
            out = f(table, monu, ids, d_t, vals, mask)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        del out
        results[chunk] = best
        print(f"chunk {chunk:4d}: {best*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
