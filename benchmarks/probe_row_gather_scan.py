"""Scan-amortized row-GATHER A/B at the 40M-step shape (round 3).

The round-2 decomposition (docs/perf_notes.md) put the serialized monu
gather at 1.33 ms = ~20 ns/row (XLA take of 65,536 rows from a [10M, 128]
f32 container).  The scan-amortized write probe (probe_dma_issue_floor.py)
measured pallas single-row WRITE DMAs at 7.5 ns/row and dual strided
[2, 1, 128] writes at 8.0 ns/row-pair — so a pallas row gather should
roughly halve the monu gather, and a dual gather could fetch table+monu
rows together.  Earlier micro-benches that said "pallas gather is 0.88x of
XLA" were chained single-gather dispatches, i.e. floor-confounded exactly
like the write probe's first run.

Variants (each scanned N=16 and N=32 inside one jit; marginal per-step
time reported, dispatch floor cancels; fresh ids per scan step so nothing
hoists):

  xla     jnp.take(table, ids)                      (today's monu gather)
  vmem    pallas_row_gather (VMEM-blocked out)       (existing kernel)
  hbm     pallas rows gather, direct HBM->HBM out    (write-kernel mirror)
  dual    pallas [2,1,128] strided gather from a stacked [2, V2, 128]
          container -> [2, K, 128] (table+monu rows in ONE issue/row)

Each step folds out.sum() into the carry (identical cost across variants)
so the gather cannot be dead-coded; the `base` variant measures that fold
alone (gather replaced by a VMEM-sized zeros) for reference.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V = int(os.environ.get("ROWS", 10_000_000))
V2 = int(os.environ.get("DUAL_ROWS", 6_000_000))
K = int(os.environ.get("K", 65536))
ITERS = int(os.environ.get("ITERS", 8))
NS = (16, 32)


def _hbm_gather_kernel(chunk, ids_ref, table_ref, out_ref, sem):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    for j in range(chunk):
        idx = ids_ref[i * chunk + j]
        pltpu.make_async_copy(
            table_ref.at[idx], out_ref.at[i * chunk + j], sem
        ).start()
    for j in range(chunk):
        idx = ids_ref[i * chunk + j]
        pltpu.make_async_copy(
            table_ref.at[idx], out_ref.at[i * chunk + j], sem
        ).wait()


def build_hbm_gather(chunk=256, interpret=False):
    import jax
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )

    def gather(table, ids):
        return pl.pallas_call(
            functools.partial(_hbm_gather_kernel, chunk),
            out_shape=jax.ShapeDtypeStruct((K, 128), table.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )(ids, table)

    return gather


def _dual_gather_kernel(chunk, ids_ref, stacked_ref, out_ref, sem):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    for j in range(chunk):
        idx = ids_ref[i * chunk + j]
        pltpu.make_async_copy(
            stacked_ref.at[:, pl.ds(idx, 1)],
            out_ref.at[:, pl.ds(i * chunk + j, 1)],
            sem,
        ).start()
    for j in range(chunk):
        idx = ids_ref[i * chunk + j]
        pltpu.make_async_copy(
            stacked_ref.at[:, pl.ds(idx, 1)],
            out_ref.at[:, pl.ds(i * chunk + j, 1)],
            sem,
        ).wait()


def build_dual_gather(chunk=256, interpret=False):
    import jax
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )

    def gather(stacked, ids):
        return pl.pallas_call(
            functools.partial(_dual_gather_kernel, chunk),
            out_shape=jax.ShapeDtypeStruct((2, K, 128), stacked.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )(ids, stacked)

    return gather


def _chain_sync(s):
    return float(np.asarray(s.ravel()[0]))


def run_scanned(gather_fn, operand, ids_np, interpret):
    """Marginal per-step seconds for `out = gather(operand, ids); carry +=
    out.sum()` scanned NS[0] vs NS[1] times."""
    import jax
    import jax.numpy as jnp

    times = {}
    for n_scan in NS:
        ids_all = jnp.asarray(ids_np[:n_scan])

        @jax.jit
        def prog(operand, ids_all):
            def body(c, ids):
                out = gather_fn(operand, ids)
                return c + out.sum(dtype=jnp.float32), None

            c, _ = jax.lax.scan(body, jnp.float32(0), ids_all)
            return c

        c = prog(operand, ids_all)
        _chain_sync(c)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                c = prog(operand, ids_all + (c < -1).astype(jnp.int32))
            _chain_sync(c)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        times[n_scan] = best
    return (times[NS[1]] - times[NS[0]]) / (NS[1] - NS[0]), times


def main():
    import jax
    import jax.numpy as jnp

    interpret = jax.devices()[0].platform == "cpu"
    if interpret:
        print("(CPU interpret mode: correctness only, timings meaningless)")
    rng = np.random.default_rng(0)
    results = {}

    ids_np = np.stack([
        np.sort(rng.integers(0, V2, K).astype(np.int32)) for _ in range(NS[1])
    ])
    table = jnp.asarray(rng.random((V, 128), np.float32))

    # correctness pins (tiny K slice, interpret or device)
    hbm_g = build_hbm_gather(interpret=interpret)
    got = np.asarray(hbm_g(table, jnp.asarray(ids_np[0])))
    ref = np.asarray(jnp.take(table, jnp.asarray(ids_np[0]), axis=0))
    np.testing.assert_array_equal(got, ref)
    print("hbm gather correctness OK", flush=True)

    variants = {}
    variants["xla"] = lambda t, i: jnp.take(t, i, axis=0)
    from mmlrec_tpu.ops.pallas_gather import pallas_row_gather

    variants["vmem"] = lambda t, i: pallas_row_gather(
        t, i, interpret=interpret)
    variants["hbm"] = hbm_g
    variants["base"] = lambda t, i: jnp.zeros((K, 128), jnp.float32) + (
        t[0, 0] + i[0])

    for name, fn in variants.items():
        marginal, times = run_scanned(fn, table, ids_np, interpret)
        ns_row = marginal / K * 1e9
        results[name] = ns_row
        print(f"[{name:5s}] t16={times[16]*1e3:8.3f} ms t32={times[32]*1e3:8.3f} ms"
              f"  marginal {marginal*1e3:6.3f} ms  {ns_row:6.1f} ns/row",
              flush=True)
    del table

    stacked = jnp.asarray(rng.random((2, V2, 128), np.float32))
    dual_g = build_dual_gather(interpret=interpret)
    got = np.asarray(dual_g(stacked, jnp.asarray(ids_np[0])))
    ref = np.asarray(jnp.take(stacked, jnp.asarray(ids_np[0]), axis=1))
    np.testing.assert_array_equal(got, ref)
    print("dual gather correctness OK", flush=True)
    marginal, times = run_scanned(dual_g, stacked, ids_np, interpret)
    ns_row = marginal / K * 1e9
    results["dual"] = ns_row
    print(f"[dual ] t16={times[16]*1e3:8.3f} ms t32={times[32]*1e3:8.3f} ms"
          f"  marginal {marginal*1e3:6.3f} ms  {ns_row:6.1f} ns/row-pair "
          f"(2 arrays per issue; compare 2x hbm)", flush=True)

    print(json.dumps({"metric": "row_gather_scan_ns_per_row",
                      "V": V, "K": K,
                      **{k: round(v, 1) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
