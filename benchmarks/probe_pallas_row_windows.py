"""Can Mosaic DMA dynamic MULTI-ROW windows of a [V, 128] f32 HBM array?

bench_40m_table_update.py found single-row DMA slices compile only for
f32 [V, 128] (one lane tile): bf16 rows are pack-tiled and [V, 256] f32 is
lane-tiled [2,1], both rejected ("slice along dim 0 must be aligned").
If a dynamic window ``ref.at[pl.ds(k * idx, k)]`` of a [k*V, 128] array
compiles, then ROW-INTERLEAVED layouts collapse the SparseAdam update to
TWO DMAs per id (one read + one write of the table row + both moment rows
stored consecutively), vs 6 for split arrays.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(chunk, k, ids_ref, d_ref, t_in, t_out, scratch, sems):
    i = pl.program_id(0)

    def copy(j, back):
        idx = ids_ref[i * chunk + j]
        win = t_out.at[pl.ds(idx * k, k)]
        buf = scratch.at[pl.ds(j * k, k)]
        return pltpu.make_async_copy(
            *((buf, win) if back else (win, buf)), sems.at[0]
        )

    for j in range(chunk):
        copy(j, False).start()
    for j in range(chunk):
        copy(j, False).wait()
    scratch[:] = scratch[:] + d_ref[:]
    for j in range(chunk):
        copy(j, True).start()
    for j in range(chunk):
        copy(j, True).wait()


def rows_window_add(arr, ids, deltas, k, chunk=256, interpret=False):
    """arr[k*ids[j] + r] += deltas[j*k + r] for r in range(k)."""
    K = ids.shape[0]
    grid = (K // chunk,)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk * k, 128), lambda i, ids: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[pltpu.VMEM((chunk * k, 128), arr.dtype),
                        pltpu.SemaphoreType.DMA((1,))],
    )
    (out,) = pl.pallas_call(
        functools.partial(_kernel, chunk, k),
        out_shape=[jax.ShapeDtypeStruct(arr.shape, arr.dtype)],
        grid_spec=spec,
        input_output_aliases={2: 0},
        interpret=interpret,
    )(ids, deltas, arr)
    return out


def chain_time(fn, args, iters=8):
    out = fn(*args)
    float(np.asarray(out.ravel()[0]))
    best = float("inf")
    for _ in range(iters):
        del out
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out.ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    del out
    return best


def main():
    V, K = 2_500_000, 65_536
    rng = np.random.RandomState(0)
    perm = rng.permutation(V)[:K].astype(np.int32)
    ids = jnp.asarray(perm)
    for k in (2, 3):
        arr = jnp.asarray(rng.rand(k * V, 128).astype(np.float32))
        deltas = jnp.asarray(rng.randn(K * k, 128).astype(np.float32))
        f = jax.jit(functools.partial(rows_window_add, k=k))
        try:
            out = f(arr, ids, deltas)
            got = np.asarray(out[jnp.asarray(perm[:50] * k)])
            want = np.asarray(arr[jnp.asarray(perm[:50] * k)]) + np.asarray(
                deltas[jnp.asarray(np.arange(50) * k)])
            np.testing.assert_allclose(got, want, rtol=1e-6)
            t = chain_time(f, (arr, ids, deltas))
            print(f"k={k}: OK  {t*1e3:8.2f} ms  "
                  f"({t/K*1e9:6.1f} ns/id for {2*k} rows moved)", flush=True)
        except Exception as e:
            print(f"k={k}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        del arr, deltas


if __name__ == "__main__":
    main()
