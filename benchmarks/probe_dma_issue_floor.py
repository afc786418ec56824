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

MEASUREMENT DISCIPLINE (CLAUDE.md): at ~5 GB donated state the
per-dispatch floor is milliseconds — the same order as the kernel itself —
so chained single-kernel dispatches are floor-confounded garbage.  Each
variant therefore runs the kernel N times INSIDE one jitted lax.scan
(fresh ids per scan step), at N=16 and N=32, and reports the MARGINAL
per-row time ((t32 - t16) / (16 * K)): the dispatch floor cancels exactly.

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
ITERS = int(os.environ.get("ITERS", 8))      # timed dispatches per window
NS = (16, 32)                                # scan lengths (floor cancels)


def _kernel_rows(R, ids_ref, *refs):
    """Write grid block i's [chunk, 128] VMEM values to rows ids[i*chunk/R
    ... ] as [R, 128] DMAs."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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


def build_rows_writer(R: int, n_scan: int, chunk: int = 256,
                      interpret: bool = False):
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

    def one(table, ids, values):
        return pl.pallas_call(
            functools.partial(_kernel_rows, R),
            out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
            grid_spec=grid_spec,
            input_output_aliases={2: 0},
            interpret=interpret,
        )(ids, values, table)

    def stepper(table, ids_all, values):
        # ids_all: [n_scan, K // R]; fresh rows per scan step
        def body(t, ids):
            return one(t, ids, values), None
        table, _ = jax.lax.scan(body, table, ids_all)
        return table

    return jax.jit(stepper, donate_argnums=(0,)), n_scan


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

    def one(stacked, ids, values):
        return pl.pallas_call(
            _kernel_dual,
            out_shape=jax.ShapeDtypeStruct(stacked.shape, stacked.dtype),
            grid_spec=grid_spec,
            input_output_aliases={2: 0},
            interpret=interpret,
        )(ids, values, stacked)

    def stepper(stacked, ids_all, values):
        def body(s, ids):
            return one(s, ids, values), None
        stacked, _ = jax.lax.scan(body, stacked, ids_all)
        return stacked

    return jax.jit(stepper, donate_argnums=(0,))


def _chain_sync(s):
    return float(np.asarray(s.ravel()[0]))


def time_scanned(stepper, state, ids_all, values):
    """Best-of window time for ITERS chained dispatches of the scanned
    program; returns seconds per DISPATCH (n_scan kernel runs + floor)."""
    state = stepper(state, ids_all, values)
    _chain_sync(state)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state = stepper(state, ids_all, values)
        _chain_sync(state)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best, state


def run_variant(make_state, build, make_ids, values, interpret, check=None):
    """Time at NS[0] and NS[1] scan lengths; return marginal s/kernel-run."""
    times = {}
    for n_scan in NS:
        state = make_state()
        ids_all = make_ids(n_scan)
        import jax.numpy as jnp

        stepper = build(n_scan)
        dt, state = time_scanned(stepper, state, jnp.asarray(ids_all), values)
        times[n_scan] = dt
        if interpret and check is not None:
            check(state, ids_all)
        del state, stepper
    marginal = (times[NS[1]] - times[NS[0]]) / (NS[1] - NS[0])
    return marginal, times


def main():
    import jax
    import jax.numpy as jnp

    interpret = jax.devices()[0].platform == "cpu"
    if interpret:
        print("(CPU interpret mode: correctness only, timings meaningless)")
    rng = np.random.default_rng(0)
    results = {}

    values = jnp.asarray(rng.random((K, 128)), jnp.float32)
    for R in (1, 2, 4, 8, 16):
        def make_ids(n_scan, R=R):
            # fresh disjoint R-contiguous run starts per scan step
            out = np.empty((n_scan, K // R), np.int32)
            for s in range(n_scan):
                out[s] = np.sort(
                    rng.choice(V // (2 * R), K // R, replace=False)
                ).astype(np.int32) * (2 * R)
            return out

        def check(table, ids_all, R=R):
            got = np.asarray(table[ids_all[-1][0]:ids_all[-1][0] + R])
            np.testing.assert_allclose(got, np.asarray(values[:R]))

        marginal, times = run_variant(
            lambda: jnp.zeros((V, 128), jnp.float32),
            lambda n: build_rows_writer(R, n, interpret=interpret)[0],
            make_ids, values, interpret, check)
        ns_row = marginal / K * 1e9
        results[f"R{R}"] = ns_row
        print(f"[R={R:2d}] t16={times[16]*1e3:7.3f} ms t32={times[32]*1e3:7.3f} ms"
              f"  marginal {marginal*1e3:6.3f} ms  {ns_row:6.1f} ns/row "
              f"({K//R} DMA pairs)", flush=True)

    # dual-array strided row write.  The stacked container is 2x a table;
    # DUAL_ROWS trims V so it fits HBM next to transient double-buffers
    # (per-row DMA cost is V-independent for uniform random rows).
    V2 = int(os.environ.get("DUAL_ROWS", min(V, 6_000_000)))
    values2 = jnp.asarray(rng.random((2, K, 128)), jnp.float32)

    def make_ids_dual(n_scan):
        out = np.empty((n_scan, K), np.int32)
        for s in range(n_scan):
            out[s] = np.sort(rng.choice(V2, K, replace=False)).astype(np.int32)
        return out

    def check_dual(stacked, ids_all):
        got = np.asarray(stacked[:, ids_all[-1][0]])
        np.testing.assert_allclose(got, np.asarray(values2[:, 0]))

    marginal, times = run_variant(
        lambda: jnp.zeros((2, V2, 128), jnp.float32),
        lambda n: build_dual_writer(interpret=interpret),
        make_ids_dual, values2, interpret, check_dual)
    ns_row = marginal / K * 1e9
    results["dual"] = ns_row
    print(f"[dual] t16={times[16]*1e3:7.3f} ms t32={times[32]*1e3:7.3f} ms"
          f"  marginal {marginal*1e3:6.3f} ms  {ns_row:6.1f} ns/row-pair "
          f"(1 strided issue for 2 arrays; compare 2x R1)", flush=True)

    print(json.dumps({"metric": "dma_issue_floor_ns_per_row",
                      "V": V, "K": K,
                      **{k: round(v, 1) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
