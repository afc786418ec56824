"""Pallas row-gather for large embedding tables.

XLA's gather costs ~300 ns/row on this backend once the table exceeds VMEM
(docs/perf_notes.md "Large-vocabulary embedding scaling") — the dominant
cost of large-table training steps.  This kernel keeps the table in HBM and
issues a CHUNK of per-row async DMAs per grid step, so many row copies are
in flight at once while Pallas double-buffers the output windows.

ids arrive via scalar prefetch (PrefetchScalarGridSpec) so the DMA source
addresses are known before the kernel body runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(chunk: int, ids_ref, table_ref, out_ref, scratch, sems):
    i = pl.program_id(0)

    def issue(j):
        idx = ids_ref[i * chunk + j]
        return pltpu.make_async_copy(
            table_ref.at[idx], scratch.at[j], sems.at[j]
        )

    for j in range(chunk):
        issue(j).start()
    for j in range(chunk):
        issue(j).wait()
    out_ref[:] = scratch[:]


def pallas_row_gather(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    *,
    chunk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """table [V, D] (HBM-resident), ids [K] int32 -> rows [K, D].

    K must be a multiple of `chunk` (pad ids with any valid row id).
    Equivalent XLA math: jnp.take(table, ids, axis=0).
    """
    K = ids.shape[0]
    V, D = table.shape
    assert K % chunk == 0, (K, chunk)
    grid = (K // chunk,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],  # table stays in HBM
        out_specs=pl.BlockSpec(
            (chunk, D), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk, D), table.dtype),
            pltpu.SemaphoreType.DMA((chunk,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, chunk),
        out_shape=jax.ShapeDtypeStruct((K, D), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids, table)


def _hbm_gather_kernel(chunk: int, ids_ref, table_ref, out_ref, sem):
    i = pl.program_id(0)

    def issue(j):
        idx = ids_ref[i * chunk + j]
        return pltpu.make_async_copy(
            table_ref.at[idx], out_ref.at[i * chunk + j], sem
        )

    for j in range(chunk):
        issue(j).start()
    for j in range(chunk):
        issue(j).wait()


def pallas_rows_gather_hbm(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    *,
    chunk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """table [V, D] -> rows [K, D] via direct HBM->HBM row DMAs.

    Unlike :func:`pallas_row_gather` (VMEM-blocked output: HBM->VMEM
    scratch, VMEM->VMEM out block, Mosaic DMA back to HBM — 2x movement),
    this mirrors the write kernel (ops/pallas_scatter.py): one HBM->HBM
    copy per row, scalar-issue-bound at ~7.5 ns/row scan-amortized vs
    ~20 ns/row for XLA's take at the 40M-step shape
    (benchmarks/probe_row_gather_scan.py; docs/perf_notes.md round 3).
    Used for the two-phase step's serialized moment-container gather.

    ids may contain duplicates (reads race benignly).  K % chunk == 0.
    INTERPRET MODES follow ops/pallas_scatter.py: ``True`` = fast pure-JAX
    reference (jnp.take), ``"pallas"`` = genuine pallas interpreter,
    ``False`` = Mosaic.
    """
    if interpret and interpret != "pallas":
        return jnp.take(table, ids, axis=0)
    K = ids.shape[0]
    assert K % chunk == 0, (K, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        functools.partial(_hbm_gather_kernel, chunk),
        out_shape=jax.ShapeDtypeStruct((K, table.shape[1]), table.dtype),
        grid_spec=grid_spec,
        interpret=bool(interpret),
    )(ids, table)

def _dual_gather_kernel(chunk: int, ids_ref, bounds_ref, stacked_ref,
                        out_ref, sem):
    i = pl.program_id(0)
    lo = bounds_ref[0]
    hi = bounds_ref[1]
    c0 = i * chunk
    c1 = (i + 1) * chunk

    def issue(j):
        idx = ids_ref[i * chunk + j]
        return pltpu.make_async_copy(
            stacked_ref.at[:, pl.ds(idx, 1)],
            out_ref.at[:, pl.ds(i * chunk + j, 1)],
            sem,
        )

    # Only slots in [lo, hi) are fetched — tail pads are skipped entirely
    # (slot-space update: pad slots' output rows stay uninitialized and
    # are never consumed).  Full chunks run predicate-free, mirroring
    # ops/pallas_scatter.py::_write_kernel.
    full = (c0 >= lo) & (c1 <= hi)

    @pl.when(full)
    def _full():
        for j in range(chunk):
            issue(j).start()
        for j in range(chunk):
            issue(j).wait()

    @pl.when((c1 > lo) & (c0 < hi) & ~full)
    def _boundary():
        for j in range(chunk):
            @pl.when((c0 + j >= lo) & (c0 + j < hi))
            def _s(j=j):
                issue(j).start()
        for j in range(chunk):
            @pl.when((c0 + j >= lo) & (c0 + j < hi))
            def _w(j=j):
                issue(j).wait()


def pallas_rows_gather_dual(
    stacked: jnp.ndarray,
    ids: jnp.ndarray,
    *,
    n_real=None,
    bounds=None,
    chunk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """stacked [2, V, W] -> pairs [2, K, W]: ONE [2, 1, 128] strided DMA
    fetches BOTH planes' row per id (12.8 ns/row-PAIR scan-amortized vs
    8.8 each for two separate XLA takes — probe_row_gather_scan.py,
    docs/perf_notes.md round-3 asymmetry table).  The read-side twin of
    ops/pallas_scatter.py::pallas_rows_write_dual, usable only with the
    stacked table+moment container where plane 0 is the table row and
    plane 1 its packed (mu, nu) container row.

    ids may contain duplicates (reads race benignly).  K % chunk == 0.
    ``n_real`` ([1] int32): ids[n_real:] are padding — their output rows
    are skipped (NaN-poisoned in the reference path, undefined under the
    pallas interpreter, uninitialized under Mosaic; callers must not
    consume them).  The reference path poisons rather than zeroing so a
    CPU test that accidentally consumes pad slots fails loudly instead of
    passing on zeros and reading garbage on TPU (advisor r4).
    INTERPRET MODES follow ops/pallas_scatter.py: ``True`` = fast pure-JAX
    reference (jnp.take along axis 1), ``"pallas"`` = genuine pallas
    interpreter, ``False`` = Mosaic.
    """
    assert stacked.ndim == 3 and stacked.shape[0] == 2, stacked.shape
    K = ids.shape[0]
    windowed = n_real is not None or bounds is not None
    if bounds is None:
        # ``bounds`` ([2] int32 (lo, hi)) generalizes n_real for the SHARDED
        # path (round 5): each mesh shard fetches only its contiguous owned
        # window of the sorted unique slot list — (n-1)/n of the row-pair
        # DMAs skipped vs a full fetch.  Same skip semantics as
        # pallas_rows_write_dual; bounds overrides n_real.
        if n_real is None:
            bounds = jnp.asarray([0, K], jnp.int32)
        else:
            bounds = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 n_real.astype(jnp.int32).reshape(1)]
            )
    if interpret and interpret != "pallas":
        got = jnp.take(stacked, ids, axis=1)
        if not windowed:
            return got
        k = jnp.arange(K)
        valid = ((k >= bounds[0]) & (k < bounds[1]))[None, :, None]
        poison = jnp.nan if jnp.issubdtype(got.dtype, jnp.inexact) else jnp.iinfo(got.dtype).min
        return jnp.where(valid, got, poison)
    assert K % chunk == 0, (K, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        functools.partial(_dual_gather_kernel, chunk),
        out_shape=jax.ShapeDtypeStruct(
            (2, K, stacked.shape[2]), stacked.dtype),
        grid_spec=grid_spec,
        interpret=bool(interpret),
    )(ids, bounds, stacked)
