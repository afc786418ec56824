"""Probe the fused table+moment container gather (round-2 kernel project).

The 40M-row pallas step performs TWO 65k-row gathers per step (phase-1
table rows `sup` + packed-moment container rows `sup_c`), each on the
~17-20 ns/row fast DMA path — ~2 ms of the 5.8 ms step.  If table and
moments live interleaved in ONE [R, 256] container (lanes 0:128 = table
row, 128:256 = packed bf16 (mu, nu) pairs), ONE 256-lane gather replaces
both (docs/perf_notes.md measured the [*, 256] gather still on the fast
path at 19.4 ns/row), and the merged [Kp, 2W] acc2 buffer is ALREADY in
container layout so the kernel writes one 2-row window per id.

Variants (composite programs: gather + cheap reduce, same window):
  G2x128 : two takes from two [R, 128] arrays   (today's step)
  G256   : one take from one [R, 256] array      (the container)
  G256r  : one take from reshape([2R, 128] -> [R, 256])  (is the view free?)
  Gr128  : reshape([R, 256] -> [2R, 128]) + take of 2K interleaved rows
           (kernel-side view cost check, gather formulation)
"""

from __future__ import annotations

import json
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
    # 4M physical rows keeps every variant's residency <= 4.1 GB so all
    # four can run in one process (HBM is 15.75 GB; allocate per variant)
    R, K = 4_000_000, 1_048_576  # K large enough that gather work dominates the ~27 ms gather-main dispatch floor
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, R, K).astype(np.int32))

    @jax.jit
    def g2x128(a, b, ids):
        ra = jnp.take(a, ids, axis=0)
        rb = jnp.take(b, ids, axis=0)
        return jnp.sum(ra[:, :1]) + jnp.sum(rb[:, :1])

    @jax.jit
    def g256(c, ids):
        r = jnp.take(c, ids, axis=0)
        return jnp.sum(r[:, :1]) + jnp.sum(r[:, 128:129])

    @jax.jit
    def g256r(c2, ids):
        c = c2.reshape(-1, 256)
        r = jnp.take(c, ids, axis=0)
        return jnp.sum(r[:, :1]) + jnp.sum(r[:, 128:129])

    @jax.jit
    def gr128(c, ids):
        c2 = c.reshape(-1, 128)
        idx2 = jnp.stack([2 * ids, 2 * ids + 1], axis=1).reshape(-1)
        r = jnp.take(c2, idx2, axis=0)
        return jnp.sum(r[:, :1])

    def mk(shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32))

    results = {}
    variants = [
        ("G2x128", g2x128, lambda: (mk((R, 128)), mk((R, 128)), ids)),
        ("G256", g256, lambda: (mk((R, 256)), ids)),
        ("G256r", g256r, lambda: (mk((2 * R, 128)), ids)),
        ("Gr128_2K", gr128, lambda: (mk((R, 256)), ids)),
    ]
    for name, fn, make_args in variants:
        args = make_args()
        t = chain_time(fn, args)
        del args
        results[name] = round(t * 1e3, 2)
        print(f"{name:10s} {t*1e3:7.2f} ms  ({t/K*1e9:6.1f} ns/id)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
