"""Pallas fused row read-modify-write for the SparseAdam table update.

The two-phase embedding step's cost at production vocabularies is THREE
XLA scatter-adds over the big arrays (table, mu, nu) at the same row ids —
measured ~360 ns/row combined on this backend vs ~17 ns/row for the row
gather's fast DMA path (docs/perf_notes.md "Scatter cost isolation").
This kernel performs all three updates in ONE pass of per-row async
DMAs: for each id it reads the three rows into VMEM, adds the three
precomputed deltas, and writes them back — 6 row DMAs per id, deeply
pipelined across a chunk.

CORRECTNESS CONTRACT: `ids` must be UNIQUE physical row indices (pad with
a sacrificial row — e.g. a dedicated row the model never reads — and zero
deltas).  Duplicates would race: two chunk members RMW-ing the same row
both read the old value and the second write wins.  The two-phase path
already computes host-side dedup metadata, so callers satisfy this for
free.  Rows are whole physical rows (packed [*, 128] layout): the caller
widens logical sub-row deltas with the existing one-hot einsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rmw_kernel(chunk, n_arrays, ids_ref, *refs):
    # refs layout: [d_0..d_{n-1} (VMEM windows), t_in_0..t_in_{n-1} (HBM),
    #               t_out_0..t_out_{n-1} (HBM, aliased), scratch_0.., sems]
    d_refs = refs[:n_arrays]
    out_refs = refs[2 * n_arrays: 3 * n_arrays]
    scratch = refs[3 * n_arrays: 4 * n_arrays]
    sems = refs[4 * n_arrays]
    i = pl.program_id(0)

    # ONE DMA semaphore per array, shared by the chunk's row copies: TPU
    # semaphore memory (sflag) holds only ~512 words, so per-(array, row)
    # semaphores overflow it at useful chunk sizes.  Completion counting is
    # aggregate — each copy increments sems[a] by its size and each wait
    # drains one copy's worth, so waiting j times = waiting all j copies.
    def read(a, j):
        idx = ids_ref[i * chunk + j]
        return pltpu.make_async_copy(
            out_refs[a].at[idx], scratch[a].at[j], sems.at[a]
        )

    def write(a, j):
        idx = ids_ref[i * chunk + j]
        return pltpu.make_async_copy(
            scratch[a].at[j], out_refs[a].at[idx], sems.at[a]
        )

    for a in range(n_arrays):
        for j in range(chunk):
            read(a, j).start()
    for a in range(n_arrays):
        for j in range(chunk):
            read(a, j).wait()
        scratch[a][:] = (
            scratch[a][:].astype(jnp.float32) + d_refs[a][:].astype(jnp.float32)
        ).astype(scratch[a].dtype)
    for a in range(n_arrays):
        for j in range(chunk):
            write(a, j).start()
    for a in range(n_arrays):
        for j in range(chunk):
            write(a, j).wait()


def pallas_rows_add(arrays, ids, deltas, *, chunk: int = 256,
                    interpret: bool = False):
    """``arrays[a][ids[k]] += deltas[a][k]`` for every array in one fused
    per-row-DMA pass.

    arrays: tuple of [V, D_a] HBM-resident arrays (same V; widths and
    dtypes may differ — deltas are added in f32 and stored back in the
    array dtype).
    ids: [K] int32, UNIQUE (see module contract), K % chunk == 0.
    deltas: tuple of [K, D_a] arrays.
    Returns the updated arrays (buffers donated via input_output_aliases).
    """
    n = len(arrays)
    assert len(deltas) == n
    K = ids.shape[0]
    V = arrays[0].shape[0]
    assert K % chunk == 0, (K, chunk)
    for a, d in zip(arrays, deltas):
        assert a.shape[0] == V and d.shape == (K, a.shape[1])
    grid = (K // chunk,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=(
            [
                pl.BlockSpec((chunk, a.shape[1]), lambda i, ids: (i, 0),
                             memory_space=pltpu.VMEM)
                for a in arrays
            ]
            + [pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n)]
        ),
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n)],
        scratch_shapes=(
            [pltpu.VMEM((chunk, a.shape[1]), a.dtype) for a in arrays]
            + [pltpu.SemaphoreType.DMA((n,))]
        ),
    )
    out = pl.pallas_call(
        functools.partial(_rmw_kernel, chunk, n),
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays],
        grid_spec=grid_spec,
        # alias each [V, D] array input (operand n+a after the prefetched
        # ids) to output a so the update is in-place
        input_output_aliases={1 + n + a: a for a in range(n)},
        interpret=interpret,
    )(ids, *deltas, *arrays)
    return tuple(out)
