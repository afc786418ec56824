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

INTERPRET MODES: ``interpret=True`` runs a fast pure-JAX reference
implementation of the same contract (scatter set/add with drop-out-of-
window) — the CPU test suite's path; pallas's own interpreter executes
the per-row DMA loops in Python and costs MINUTES per trainer-level test
at realistic step counts.  ``interpret="pallas"`` forces the genuine
pallas interpreter (kernel-logic coverage, tests/test_pallas_kernels.py).
``interpret=False`` is the real Mosaic kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_rows_write(arrays, ids, values, bounds):
    """Pure-JAX reference for pallas_rows_write's contract (interpret=True
    fast path): slots outside [lo, hi) are dropped; ids unique."""
    K = ids.shape[0]
    k = jnp.arange(K, dtype=jnp.int32)
    in_win = (k >= bounds[0]) & (k < bounds[1])
    safe = jnp.where(in_win, ids, arrays[0].shape[0])  # OOB -> dropped
    return tuple(
        a.at[safe].set(v, mode="drop") for a, v in zip(arrays, values)
    )


def _reference_rows_update(arrays, ids, deltas, modes, masks, n_real):
    """Pure-JAX reference for pallas_rows_update's contract: slots past
    n_real are padding (skipped); "add" in f32 math stored in the array
    dtype; "set" is a masked byte-select merge."""
    K = ids.shape[0]
    V = arrays[0].shape[0]
    k = jnp.arange(K, dtype=jnp.int32)
    valid = k < n_real[0]
    idc = jnp.clip(ids, 0, V - 1)
    safe = jnp.where(valid, idc, V)  # pads -> dropped
    outs = []
    set_idx = 0
    for a, (arr, d, mode) in enumerate(zip(arrays, deltas, modes)):
        old = jnp.take(arr, idc, axis=0)
        if mode == "set":
            new = jnp.where(masks[a] != 0, d, old)
            set_idx += 1
        else:
            new = (
                old.astype(jnp.float32) + d.astype(jnp.float32)
            ).astype(arr.dtype)
        outs.append(arr.at[safe].set(new, mode="drop"))
    return tuple(outs)


def _rmw_kernel(chunk, n_arrays, modes, ids_ref, nreal_ref, *refs):
    # refs layout: [d_0..d_{n-1} (VMEM windows),
    #               m_0..m_{s-1} (VMEM mask windows, "set" arrays only),
    #               t_in_0..t_in_{n-1} (HBM),
    #               t_out_0..t_out_{n-1} (HBM, aliased), scratch_0.., sems]
    n_set = sum(m == "set" for m in modes)
    d_refs = refs[:n_arrays]
    m_refs = refs[n_arrays: n_arrays + n_set]
    base = n_arrays + n_set
    out_refs = refs[base + n_arrays: base + 2 * n_arrays]
    scratch = refs[base + 2 * n_arrays: base + 3 * n_arrays]
    sems = refs[base + 3 * n_arrays]
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

    # Slots >= n_real are padding (untouched distinct rows at the TAIL with
    # zero / unmasked deltas).  Skew-heavy batches (zipf traffic) leave most
    # slots padded, so skipping pad work scales the kernel with the batch's
    # UNIQUE row count rather than K.  Granularity is the whole CHUNK: a
    # per-DMA predicate measured SLOWER than the skipped DMAs saved (the
    # scalar core both evaluates predicates and issues DMAs), so only
    # all-pad chunks are skipped and the boundary chunk runs in full.
    @pl.when(i * chunk < nreal_ref[0])
    def _body():
        for a in range(n_arrays):
            for j in range(chunk):
                read(a, j).start()
        set_idx = 0
        for a in range(n_arrays):
            for j in range(chunk):
                read(a, j).wait()
            if modes[a] == "set":
                # masked byte-select merge: dtype-agnostic, so the array
                # may be an opaque container (e.g. bf16 moment PAIRS
                # bitcast into f32 lanes) — no arithmetic touches the
                # payload
                scratch[a][:] = jnp.where(
                    m_refs[set_idx][:] != 0, d_refs[a][:], scratch[a][:]
                )
                set_idx += 1
            else:
                scratch[a][:] = (
                    scratch[a][:].astype(jnp.float32)
                    + d_refs[a][:].astype(jnp.float32)
                ).astype(scratch[a].dtype)
        for a in range(n_arrays):
            for j in range(chunk):
                write(a, j).start()
        for a in range(n_arrays):
            for j in range(chunk):
                write(a, j).wait()


def _write_kernel(chunk, n_arrays, ids_ref, bounds_ref, *refs):
    # refs layout: [v_0..v_{n-1} (VMEM value windows),
    #               t_in_0..t_in_{n-1} (HBM), t_out_0.. (HBM, aliased), sems]
    v_refs = refs[:n_arrays]
    out_refs = refs[2 * n_arrays: 3 * n_arrays]
    sems = refs[3 * n_arrays]
    i = pl.program_id(0)
    lo = bounds_ref[0]
    hi = bounds_ref[1]
    c0 = i * chunk
    c1 = (i + 1) * chunk

    def write(a, j):
        idx = ids_ref[i * chunk + j]
        return pltpu.make_async_copy(
            v_refs[a].at[j], out_refs[a].at[idx], sems.at[a]
        )

    # Only slots in [lo, hi) are written — tail pads (and, on the sharded
    # path, slots owned by OTHER shards) hold zeros, not row contents, and
    # the sharded local ids are out of range there.  Chunks fully inside
    # the window run predicate-free (per-DMA predicates measured ~20%
    # slower overall — the scalar core issues DMAs AND evaluates them);
    # only the boundary chunks pay per-row predication.
    full = (c0 >= lo) & (c1 <= hi)

    @pl.when(full)
    def _full():
        for a in range(n_arrays):
            for j in range(chunk):
                write(a, j).start()
        for a in range(n_arrays):
            for j in range(chunk):
                write(a, j).wait()

    @pl.when((c1 > lo) & (c0 < hi) & ~full)
    def _boundary():
        for a in range(n_arrays):
            for j in range(chunk):
                @pl.when((c0 + j >= lo) & (c0 + j < hi))
                def _s(a=a, j=j):
                    write(a, j).start()
        for a in range(n_arrays):
            for j in range(chunk):
                @pl.when((c0 + j >= lo) & (c0 + j < hi))
                def _w(a=a, j=j):
                    write(a, j).wait()


def pallas_rows_write(arrays, ids, values, *, n_real=None, bounds=None,
                      chunk: int = 256, interpret: bool = False):
    """``arrays[a][ids[k]] = values[a][k]`` for the real slots, in one pass
    of per-row WRITE DMAs — half the DMA issues of a read-modify-write.

    The caller supplies each touched row's complete NEW contents (the
    two-phase step already holds the old rows from its phase-1 gather, so
    new = old + delta / masked-merge is computed in XLA where it fuses for
    free).  ids must be UNIQUE physical rows with all padding at the TAIL
    (ids[n_real:]), exactly what batch_step_metadata emits; pad slots are
    never written.  ``bounds`` ([2] int32 (lo, hi)) generalizes n_real for
    the SHARDED path: each device owns a contiguous window of the sorted
    unique row list and writes only slots in [lo, hi) — local ids are out
    of range outside it.  bounds overrides n_real; both None = all K.
    """
    n = len(arrays)
    assert len(values) == n
    K = ids.shape[0]
    V = arrays[0].shape[0]
    assert K % chunk == 0, (K, chunk)
    for a, v in zip(arrays, values):
        assert a.shape[0] == V and v.shape == (K, a.shape[1])
    if bounds is None:
        if n_real is None:
            bounds = jnp.asarray([0, K], jnp.int32)
        else:
            bounds = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), n_real.astype(jnp.int32)]
            )
    if interpret and interpret != "pallas":
        return _reference_rows_write(arrays, ids, values, bounds)
    win = lambda i, ids, bounds: (i, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K // chunk,),
        in_specs=(
            [
                pl.BlockSpec((chunk, a.shape[1]), win,
                             memory_space=pltpu.VMEM)
                for a in arrays
            ]
            + [pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n)]
        ),
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((n,))],
    )
    out = pl.pallas_call(
        functools.partial(_write_kernel, chunk, n),
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays],
        grid_spec=grid_spec,
        input_output_aliases={2 + n + a: a for a in range(n)},
        interpret=bool(interpret),
    )(ids, bounds, *values, *arrays)
    return tuple(out)


def _write_kernel_pipelined(chunk, n_arrays, n_chunks, ids_ref, bounds_ref,
                            *refs):
    # refs: [v_hbm_0..n-1 (HBM values), t_in_0.., t_out_0.. (HBM, aliased),
    #        vbuf_0..n-1 (VMEM (2, chunk, W) double buffers),
    #        sem_in (n,), sem_out (n,)]
    v_hbm = refs[:n_arrays]
    out_refs = refs[2 * n_arrays: 3 * n_arrays]
    vbufs = refs[3 * n_arrays: 4 * n_arrays]
    sem_in = refs[4 * n_arrays]
    sem_out = refs[4 * n_arrays + 1]
    i = pl.program_id(0)
    lo = bounds_ref[0]
    hi = bounds_ref[1]

    def in_copy(a, c):
        return pltpu.make_async_copy(
            v_hbm[a].at[pl.ds(c * chunk, chunk)], vbufs[a].at[c % 2],
            sem_in.at[a],
        )

    def write(a, c, j):
        idx = ids_ref[c * chunk + j]
        return pltpu.make_async_copy(
            vbufs[a].at[c % 2].at[j], out_refs[a].at[idx], sem_out.at[a]
        )

    def chunk_live(c):
        return (c * chunk < hi) & ((c + 1) * chunk > lo)

    def start_writes(c):
        c0 = c * chunk
        full = (c0 >= lo) & (c0 + chunk <= hi)

        @pl.when(full)
        def _full():
            for a in range(n_arrays):
                for j in range(chunk):
                    write(a, c, j).start()

        @pl.when(chunk_live(c) & ~full)
        def _boundary():
            for a in range(n_arrays):
                for j in range(chunk):
                    @pl.when((c0 + j >= lo) & (c0 + j < hi))
                    def _s(a=a, c=c, j=j):
                        write(a, c, j).start()

    def wait_writes(c):
        c0 = c * chunk
        full = (c0 >= lo) & (c0 + chunk <= hi)

        @pl.when(full)
        def _full():
            for a in range(n_arrays):
                for j in range(chunk):
                    write(a, c, j).wait()

        @pl.when(chunk_live(c) & ~full)
        def _boundary():
            for a in range(n_arrays):
                for j in range(chunk):
                    @pl.when((c0 + j >= lo) & (c0 + j < hi))
                    def _w(a=a, c=c, j=j):
                        write(a, c, j).wait()

    # software pipeline: values chunk i is prefetched at step i-1 (one big
    # contiguous DMA per array), and chunk i's scattered write DMAs are
    # WAITED one grid step late, so the end-of-chunk completion stall
    # overlaps the next chunk's issue work.  Ordering guarantees: writes of
    # chunk i-1 are waited BEFORE the in-copy for chunk i+1 starts, because
    # both touch vbuf[(i-1) % 2] == vbuf[(i+1) % 2].
    @pl.when((i == 0) & chunk_live(i))
    def _prime():
        for a in range(n_arrays):
            in_copy(a, 0).start()

    @pl.when(chunk_live(i))
    def _consume():
        for a in range(n_arrays):
            in_copy(a, i).wait()

    @pl.when((i > 0) & chunk_live(i - 1))
    def _deferred():
        wait_writes(i - 1)

    @pl.when((i + 1 < n_chunks) & chunk_live(i + 1))
    def _prefetch():
        for a in range(n_arrays):
            in_copy(a, i + 1).start()

    @pl.when(chunk_live(i))
    def _issue():
        start_writes(i)

    @pl.when((i == n_chunks - 1) & chunk_live(i))
    def _drain():
        wait_writes(i)


def pallas_rows_write_pipelined(arrays, ids, values, *, n_real=None,
                                bounds=None, chunk: int = 256,
                                interpret: bool = False):
    """pallas_rows_write with an explicit software pipeline (VERDICT round-1
    item 4): manual double-buffered value windows (one contiguous DMA per
    chunk per array instead of the BlockSpec stream) and write waits
    deferred one chunk, so each chunk's completion stall overlaps the next
    chunk's DMA issue.  Same contract as pallas_rows_write."""
    n = len(arrays)
    assert len(values) == n
    K = ids.shape[0]
    V = arrays[0].shape[0]
    assert K % chunk == 0, (K, chunk)
    for a, v in zip(arrays, values):
        assert a.shape[0] == V and v.shape == (K, a.shape[1])
    if bounds is None:
        if n_real is None:
            bounds = jnp.asarray([0, K], jnp.int32)
        else:
            bounds = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), n_real.astype(jnp.int32)]
            )
    if interpret and interpret != "pallas":
        return _reference_rows_write(arrays, ids, values, bounds)
    n_chunks = K // chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n)]
            + [pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n)]
        ),
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n)],
        scratch_shapes=(
            [pltpu.VMEM((2, chunk, a.shape[1]), a.dtype) for a in arrays]
            + [pltpu.SemaphoreType.DMA((n,)), pltpu.SemaphoreType.DMA((n,))]
        ),
    )
    out = pl.pallas_call(
        functools.partial(_write_kernel_pipelined, chunk, n, n_chunks),
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays],
        grid_spec=grid_spec,
        input_output_aliases={2 + n + a: a for a in range(n)},
        interpret=bool(interpret),
    )(ids, bounds, *values, *arrays)
    return tuple(out)


def pallas_rows_update(arrays, ids, deltas, *, modes=None, masks=None,
                       n_real=None, chunk: int = 256,
                       interpret: bool = False):
    """Fused per-row-DMA read-modify-write over several [V, D_a] arrays.

    Per array, mode "add" (default) performs ``arrays[a][ids[k]] +=
    deltas[a][k]`` (f32 math, stored back in the array dtype); mode "set"
    performs a masked byte-select merge ``where(masks[a][k] != 0,
    deltas[a][k], old_row)`` with NO arithmetic on the payload — the array
    may be an opaque lane container (e.g. both bf16 Adam moments packed as
    pairs into f32 lanes, train/sparse_embedding.py SparseAdamPackedState).

    arrays: tuple of [V, D_a] HBM-resident arrays (same V; widths and
    dtypes may differ).
    ids: [K] int32, UNIQUE (see module contract), K % chunk == 0.
    deltas: tuple of [K, D_a] arrays (add deltas, or set values).
    masks: per-array [K, D_a] (array dtype; nonzero = lane owned) for every
    "set" entry, None for "add" entries.
    n_real: optional [1] int32 device scalar — ids[n_real:] are padding and
    their DMAs are skipped, so kernel work scales with the batch's unique
    row count (skewed traffic) instead of K.  None = all K real.
    Returns the updated arrays (buffers donated via input_output_aliases).
    """
    n = len(arrays)
    modes = tuple(modes) if modes is not None else ("add",) * n
    assert len(deltas) == n and len(modes) == n
    set_masks = []
    for a, mode in enumerate(modes):
        if mode == "set":
            assert masks is not None and masks[a] is not None, a
            assert masks[a].shape == deltas[a].shape
            set_masks.append(masks[a])
        else:
            assert mode == "add", mode
    K = ids.shape[0]
    V = arrays[0].shape[0]
    assert K % chunk == 0, (K, chunk)
    for a, d in zip(arrays, deltas):
        assert a.shape[0] == V and d.shape == (K, a.shape[1])
    grid = (K // chunk,)
    s = len(set_masks)
    if n_real is None:
        n_real = jnp.full((1,), K, jnp.int32)
    if interpret and interpret != "pallas":
        return _reference_rows_update(arrays, ids, deltas, modes, masks,
                                      n_real)
    win = lambda i, ids, nreal: (i, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=(
            [
                pl.BlockSpec((chunk, a.shape[1]), win,
                             memory_space=pltpu.VMEM)
                for a in arrays
            ]
            + [
                pl.BlockSpec((chunk, m.shape[1]), win,
                             memory_space=pltpu.VMEM)
                for m in set_masks
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
        functools.partial(_rmw_kernel, chunk, n, modes),
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays],
        grid_spec=grid_spec,
        # alias each [V, D] array input (operand 2 + n + s + a: after the
        # prefetched ids + n_real, the deltas and the set masks) to output
        # a so the update is in-place
        input_output_aliases={2 + n + s + a: a for a in range(n)},
        interpret=bool(interpret),
    )(ids, n_real, *deltas, *set_masks, *arrays)
    return tuple(out)


def pallas_rows_add(arrays, ids, deltas, *, n_real=None, chunk: int = 256,
                    interpret: bool = False):
    """``arrays[a][ids[k]] += deltas[a][k]`` for every array in one fused
    per-row-DMA pass (all-"add" form of pallas_rows_update)."""
    return pallas_rows_update(
        arrays, ids, deltas, n_real=n_real, chunk=chunk, interpret=interpret
    )


def _reference_rows_write_dual(stacked, ids, values, bounds):
    """Pure-JAX reference for pallas_rows_write_dual's contract: one
    [2, 1, 128] strided row-pair write per in-window slot."""
    K = ids.shape[0]
    k = jnp.arange(K, dtype=jnp.int32)
    in_win = (k >= bounds[0]) & (k < bounds[1])
    safe = jnp.where(in_win, ids, stacked.shape[1])  # OOB -> dropped
    return stacked.at[:, safe].set(values, mode="drop")


def _write_kernel_dual(chunk, ids_ref, bounds_ref, v_ref, _in, out_ref, sem):
    i = pl.program_id(0)
    lo = bounds_ref[0]
    hi = bounds_ref[1]
    c0 = i * chunk
    c1 = (i + 1) * chunk

    def write(j):
        idx = ids_ref[i * chunk + j]
        return pltpu.make_async_copy(
            v_ref.at[:, pl.ds(j, 1)], out_ref.at[:, pl.ds(idx, 1)], sem
        )

    full = (c0 >= lo) & (c1 <= hi)

    @pl.when(full)
    def _full():
        for j in range(chunk):
            write(j).start()
        for j in range(chunk):
            write(j).wait()

    @pl.when((c1 > lo) & (c0 < hi) & ~full)
    def _boundary():
        for j in range(chunk):
            @pl.when((c0 + j >= lo) & (c0 + j < hi))
            def _s(j=j):
                write(j).start()
        for j in range(chunk):
            @pl.when((c0 + j >= lo) & (c0 + j < hi))
            def _w(j=j):
                write(j).wait()


def pallas_rows_write_dual(stacked, ids, values, *, n_real=None, bounds=None,
                           chunk: int = 256, interpret: bool = False):
    """``stacked[:, ids[k]] = values[:, k]`` in ONE [2, 1, 128] strided DMA
    per row — the dual-array form of :func:`pallas_rows_write`.

    ``stacked`` is the [2, Vp, 128] view of the fused table+moment
    container (table rows in plane 0, packed bf16 (mu, nu) pairs in plane
    1); a strided descriptor writes BOTH planes' rows for one scalar-core
    issue, measured 8.0 ns/row-pair vs 15.0 as two single-row copies
    (benchmarks/probe_dma_issue_floor.py, scan-amortized, round 3).  Same
    uniqueness / tail-padding / [lo, hi) bounds contract as
    pallas_rows_write.
    """
    K = ids.shape[0]
    assert stacked.ndim == 3 and stacked.shape[0] == 2, stacked.shape
    assert values.shape == (2, K, stacked.shape[2]), values.shape
    assert K % chunk == 0, (K, chunk)
    if bounds is None:
        if n_real is None:
            bounds = jnp.asarray([0, K], jnp.int32)
        else:
            bounds = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), n_real.astype(jnp.int32)]
            )
    if interpret and interpret != "pallas":
        return _reference_rows_write_dual(stacked, ids, values, bounds)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K // chunk,),
        in_specs=[
            pl.BlockSpec((2, chunk, stacked.shape[2]),
                         lambda i, ids, bounds: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        functools.partial(_write_kernel_dual, chunk),
        out_shape=jax.ShapeDtypeStruct(stacked.shape, stacked.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},
        interpret=bool(interpret),
    )(ids, bounds, values, stacked)
