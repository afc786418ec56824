"""Micro-bench: pallas_row_gather vs XLA jnp.take on a large HBM table.

Targets the measured #1 large-table bottleneck (docs/perf_notes.md, ~300 ns/row
XLA gather once the table exceeds VMEM).  Chain-synced timing per CLAUDE.md —
block_until_ready does not reliably block on this backend.

Usage: python benchmarks/bench_pallas_gather.py [V] [D] [K]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mmlrec_tpu.ops.pallas_gather import pallas_row_gather


def chain_sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def bench(fn, args, iters=20, trials=3):
    out = fn(*args)
    chain_sync(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        chain_sync(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 409_600

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (V, D), jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (K,), 0, V, jnp.int32)

    xla_gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(axis=0))
    pal_gather = jax.jit(
        lambda t, i: pallas_row_gather(t, i).sum(axis=0)
    )

    # correctness on a small slice
    small_ids = ids[:2048]
    ref = np.asarray(jnp.take(table, small_ids, axis=0))
    got = np.asarray(pallas_row_gather(table, small_ids))
    err = float(np.abs(ref - got).max())
    print(f"max_abs_err={err}")
    assert err == 0.0, err

    t_xla = bench(xla_gather, (table, ids))
    t_pal = bench(pal_gather, (table, ids))
    print(f"V={V} D={D} K={K}")
    print(f"xla_take : {t_xla*1e3:8.3f} ms  ({t_xla/K*1e9:6.1f} ns/row)")
    print(f"pallas   : {t_pal*1e3:8.3f} ms  ({t_pal/K*1e9:6.1f} ns/row)")
    print(f"speedup  : {t_xla/t_pal:.2f}x")


if __name__ == "__main__":
    main()
