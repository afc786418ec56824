"""DMA-issue asymptote for the 40M-row table update (VERDICT r2 item 3).

The rows-RMW/write kernel (ops/pallas_scatter.py) is issue-bound: the
scalar core issues 2 start + 2 wait DMA pairs per touched row (table +
packed moments), ~131k issues per 40M x 32 step at K=65536.  Software
pipelining was a measured negative (no completion stall to hide), so the
remaining lever is ISSUING FEWER DMAs.  This probe measures, same-window:

  A. rows/s vs DMA height R: write K rows as K/R contiguous [R, 128]
     copies (ids constructed R-contiguous).  Total bytes constant; issue
     count scales 1/R.  The R -> inf limit is the pure-bandwidth floor,
     R=1 is today's kernel; the gap is what run-coalescing can recover
     where sorted-unique-row RUNS exist (zipf head traffic).
  B. dual-array row writes: table+moments stacked [2, V, 128]; one
     async_copy of [2, 1, 128] per row (strided descriptor) instead of two
     [1, 128] copies — halves issues even for UNIFORM traffic if Mosaic
     charges one issue for the strided pair.

Output: ns/row per variant + implied floor for the 40M step.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V = int(os.environ.get("ROWS", 10_000_000))  # physical rows (40M/4 packed)
K = int(os.environ.get("K", 65536))          # touched rows per step
ITERS = int(os.environ.get("ITERS", 20))


def _kernel_rows(R, ids_ref, *refs):
    """Write grid block i's [chunk, 128] VMEM values to rows ids[i*chunk/R
    ... ] as [R, 128] DMAs."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    (v_ref, _table_in, out_ref, sem) = refs
    i = pl.program_id(0)
    chunk = v_ref.shape[0]
    n_dma = chunk // R
    for j in range(n_dma):
        idx = ids_ref[i * n_dma + j]
        pltpu.make_async_copy(
            v_ref.at[pl.ds(j * R, R)], out_ref.at[pl.ds(idx, R)], sem
        ).start()
    for j in range(n_dma):
        idx = ids_ref[i * n_dma + j]
        pltpu.make_async_copy(
            v_ref.at[pl.ds(j * R, R)], out_ref.at[pl.ds(idx, R)], sem
        ).wait()


def build_rows_writer(R: int, chunk: int = 256, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 128), lambda i, ids: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )

    def writer(table, ids, values):
        return pl.pallas_call(
            functools.partial(_kernel_rows, R),
            out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
            grid_spec=grid_spec,
            input_output_aliases={2: 0},
            interpret=interpret,
        )(ids, values, table)

    return jax.jit(writer, donate_argnums=(0,))


def _kernel_dual(ids_ref, *refs):
    """One [2, 1, 128] strided copy per row: both arrays in one issue."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (v_ref, _stacked_in, out_ref, sem) = refs
    i = pl.program_id(0)
    chunk = v_ref.shape[1]
    for j in range(chunk):
        idx = ids_ref[i * chunk + j]
        pltpu.make_async_copy(
            v_ref.at[:, pl.ds(j, 1)], out_ref.at[:, pl.ds(idx, 1)], sem
        ).start()
    for j in range(chunk):
        idx = ids_ref[i * chunk + j]
        pltpu.make_async_copy(
            v_ref.at[:, pl.ds(j, 1)], out_ref.at[:, pl.ds(idx, 1)], sem
        ).wait()


def build_dual_writer(chunk: int = 256, interpret: bool = False):
    import jax
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // chunk,),
        in_specs=[
            pl.BlockSpec((2, chunk, 128), lambda i, ids: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )

    def writer(stacked, ids, values):
        return pl.pallas_call(
            _kernel_dual,
            out_shape=jax.ShapeDtypeStruct(stacked.shape, stacked.dtype),
            grid_spec=grid_spec,
            input_output_aliases={2: 0},
            interpret=interpret,
        )(ids, values, stacked)

    return jax.jit(writer, donate_argnums=(0,))


def time_writer(step, state, ids, values):
    import jax.numpy as jnp

    def chain_sync(s):
        return float(np.asarray(s.ravel()[0]))

    state = step(state, ids, values)
    chain_sync(state)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state = step(state, ids, values)
        chain_sync(state)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best, state


def main():
    import jax
    import jax.numpy as jnp

    interpret = jax.devices()[0].platform == "cpu"
    if interpret:
        print("(CPU interpret mode: correctness only, timings meaningless)")
    rng = np.random.default_rng(0)
    results = {}

    for R in (1, 2, 4, 8, 16):
        # ids: K/R run starts, each run R-contiguous, runs disjoint
        starts = np.sort(
            rng.choice(V // (2 * R), K // R, replace=False).astype(np.int32)
        ) * (2 * R)
        table = jnp.zeros((V, 128), jnp.float32)
        values = jnp.asarray(rng.random((K, 128)), jnp.float32)
        step = build_rows_writer(R, interpret=interpret)
        dt, table = time_writer(step, table, jnp.asarray(starts), values)
        ns_row = dt / K * 1e9
        results[f"R{R}"] = ns_row
        print(f"[R={R:2d}] {dt*1e3:7.3f} ms  {ns_row:6.1f} ns/row "
              f"({K//R} DMA pairs)", flush=True)
        if interpret:
            got = np.asarray(table[starts[0]:starts[0]+R])
            np.testing.assert_allclose(got, np.asarray(values[:R]))
        del table

    # dual-array strided row write
    stacked = jnp.zeros((2, V, 128), jnp.float32)
    ids = np.sort(rng.choice(V, K, replace=False).astype(np.int32))
    values2 = jnp.asarray(rng.random((2, K, 128)), jnp.float32)
    step = build_dual_writer(interpret=interpret)
    dt, stacked = time_writer(step, stacked, jnp.asarray(ids), values2)
    # per-row basis: each row carries 2 arrays' worth => compare with 2*R1
    ns_row = dt / K * 1e9
    results["dual"] = ns_row
    print(f"[dual] {dt*1e3:7.3f} ms  {ns_row:6.1f} ns/row-pair "
          f"(1 strided issue for 2 arrays)", flush=True)
    if interpret:
        got = np.asarray(stacked[:, ids[0]])
        np.testing.assert_allclose(got, np.asarray(values2[:, 0]))

    print(json.dumps({"metric": "dma_issue_floor_ns_per_row",
                      "V": V, "K": K, **{k: round(v, 1) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
