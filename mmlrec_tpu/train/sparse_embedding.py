"""Row-sparse optimizer updates for the fused embedding table.

At production vocabularies the dense-Adam update dominates the step: adam
reads and writes table+mu+nu for EVERY row every step (~5 GB HBM traffic
per step at 10M vocab x 32; docs/perf_notes.md).  A batch touches at most
B x F rows, so this applies SparseAdam semantics: moments and rows are
updated ONLY for ids present in the batch, via gathers/scatters of
[B*F, D] rows (~100x less traffic).

Semantics note (opt-in via ``model_config.extra['sparse_embedding_update']``):
like torch.optim.SparseAdam, moment decay for untouched rows is deferred —
this differs from dense Adam exactly the way every production sparse
embedding optimizer does.

Duplicate ids in a batch are handled without a unique(): the dense autodiff
gradient row for a duplicated id already contains the SUMMED gradient, so
gathering by the (duplicated) flat id list yields identical row values, and
scatter-``set`` writes are idempotent across duplicates.

STATUS (round 1): semantically correct and tested, but measured SLOWER than
dense adam at 10M vocab (31 ms vs 23 ms/step) because autodiff still
materializes the dense [V, D] cotangent and XLA copies the big buffers on
scatter.  The full win requires a two-phase step that differentiates w.r.t.
the GATHERED ROWS only (model accepts pre-gathered embeddings) so no dense
[V, D] gradient ever exists — planned for round 2.  Until then treat the
flag as experimental.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SparseAdamState(NamedTuple):
    mu: jnp.ndarray  # [V, D]
    nu: jnp.ndarray  # [V, D]
    count: jnp.ndarray  # scalar int32


class SparseAdamPackedState(NamedTuple):
    """Both bfloat16 Adam moments packed as (mu, nu) PAIRS into the f32
    lanes of ONE [V, W] container array: lane j holds bitcast((mu_j, nu_j)).

    Same HBM as split bf16 moments, but (a) the container is a plain f32
    [V, 128] array so Mosaic can row-slice it (per-row DMA windows are
    ILLEGAL on bf16 HBM arrays and on multi-lane-tile [V, 256] arrays —
    docs/perf_notes.md), and (b) one row carries both moments, so the
    update touches 4 rows per id instead of 6 and the moment gather halves.
    The kernel merges new pairs with a masked byte-select ("set" mode of
    ops/pallas_scatter.py), so the f32 container payload is never
    arithmetic-touched."""

    monu: jnp.ndarray  # [V, W] float32 container of bf16 (mu, nu) pairs
    count: jnp.ndarray  # scalar int32


class SparseAdamFoldedState(NamedTuple):
    """Packed-moment state whose monu container is FOLDED into the table
    leaf itself: the FusedEmbedding param is [2*Vp, W] with table rows in
    [0, Vp) and the packed (mu, nu) container in [Vp, 2*Vp)
    (``table_container="stacked"``).  One contiguous array lets the pallas
    update write a touched row's table+moment pair with ONE [2, 1, 128]
    strided DMA (8.0 vs 15.0 ns/row-pair, probe_dma_issue_floor.py), and
    eval/predict/checkpoint paths see a normal (fat) table param whose
    live rows are always current.  Only the step counter remains here."""

    count: jnp.ndarray  # scalar int32


# Pack/unpack are SAME-SHAPE integer shifts/masks, not shape-changing
# bitcasts: XLA lowers f32[...] <-> bf16[..., 2] bitcast_convert_type
# through materialized u32[..., 2] expand/select machinery (~600 MB/step
# of the 40M step's HBM ledger, docs/perf_notes.md round-3), while the
# [..., W]-shaped mask/shift/or forms fuse into the neighboring
# elementwise work.  Bit layout (pinned by
# tests/test_sparse_embedding.py::test_monu_pack_bit_layout): mu = low
# 16 bits, nu = high 16 bits of each f32 lane — exactly the [..., 2]
# little-endian pair order the original bitcast produced, so containers
# written by either form are interchangeable.


def unpack_monu(container: jnp.ndarray):
    """[..., W] f32 container -> (mu, nu) bfloat16 [..., W]."""
    ci = jax.lax.bitcast_convert_type(container, jnp.uint32)
    mu = jax.lax.bitcast_convert_type(ci.astype(jnp.uint16), jnp.bfloat16)
    nu = jax.lax.bitcast_convert_type(
        (ci >> 16).astype(jnp.uint16), jnp.bfloat16
    )
    return mu, nu


def unpack_monu_f32(container: jnp.ndarray):
    """[..., W] f32 container -> (mu, nu) FLOAT32 [..., W] directly.

    bf16 -> f32 conversion is exactly ``bits << 16``, so the f32 moments
    come straight from two integer ops per lane with no bf16 intermediate
    (bit-identical to unpack_monu(...)[i].astype(f32) — the hot path's
    only use of the moments)."""
    ci = jax.lax.bitcast_convert_type(container, jnp.uint32)
    mu = jax.lax.bitcast_convert_type(ci << 16, jnp.float32)
    nu = jax.lax.bitcast_convert_type(ci & jnp.uint32(0xFFFF0000), jnp.float32)
    return mu, nu


def pack_monu(mu_bf16: jnp.ndarray, nu_bf16: jnp.ndarray) -> jnp.ndarray:
    """(mu, nu) bfloat16 [..., W] -> [..., W] f32 container."""
    mu_u = jax.lax.bitcast_convert_type(
        mu_bf16.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    nu_u = jax.lax.bitcast_convert_type(
        nu_bf16.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((nu_u << 16) | mu_u, jnp.float32)


def pack_monu_rounded(mu_f32: jnp.ndarray, nu_f32: jnp.ndarray) -> jnp.ndarray:
    """f32 moments -> container, with the round-to-bf16 inside: the
    ``astype(bfloat16)`` is the hardware RNE convert (one vector op) and
    everything else is same-shape integer math."""
    return pack_monu(
        mu_f32.astype(jnp.bfloat16), nu_f32.astype(jnp.bfloat16)
    )


def init_sparse_adam(table: jnp.ndarray, dtype=None, packed: bool = False):
    """dtype: moment storage dtype (default = table dtype).  bfloat16 halves
    the moment HBM (the dominant state at production vocab — e.g. 5.1 GB
    saved at 40M x 32 rows); update math stays f32.  packed=True stores
    both moments as bf16 pairs inside f32 lanes (SparseAdamPackedState) —
    the layout the pallas table_update uses for reduced-precision moments.
    (A side-by-side [V, 2W] "fused" layout was tried and REMOVED: 256-lane
    rows fall off the fast DMA path, 2.25x slower end-to-end —
    docs/perf_notes.md.)"""
    dt = dtype or table.dtype
    if packed:
        return SparseAdamPackedState(
            monu=jnp.zeros(table.shape, jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )
    return SparseAdamState(
        mu=jnp.zeros(table.shape, dt),
        nu=jnp.zeros(table.shape, dt),
        count=jnp.zeros((), jnp.int32),
    )


def split_stacked_planes(fat: jnp.ndarray, n_shards: int = 1):
    """Folded [2Vp, W] table+moment container -> (table [Vp, W], monu
    [Vp, W]) planes.

    ``n_shards == 1`` (single chip) is the plane-major layout: table rows
    in [0, Vp), the monu container in [Vp, 2Vp).  ``n_shards > 1`` is the
    SHARD-MAJOR mesh layout (round 5): global rows [d*2r, (d+1)*2r) with
    r = Vp/n_shards hold [table_d; monu_d], so a contiguous
    P('model', None) row sharding gives every shard its own local stacked
    container (both planes of each owned physical row co-resident —
    required for the zero-collective dual-DMA update,
    parallel/shard_embedding.py).  Single-chip is the n_shards=1 special
    case of the same map."""
    Vp = fat.shape[0] // 2
    if n_shards == 1:
        return fat[:Vp], fat[Vp:]
    r = Vp // n_shards
    v = fat.reshape(n_shards, 2, r, fat.shape[1])
    return (
        v[:, 0].reshape(Vp, fat.shape[1]),
        v[:, 1].reshape(Vp, fat.shape[1]),
    )


def fold_stacked_planes(table: jnp.ndarray, monu: jnp.ndarray,
                        n_shards: int = 1) -> jnp.ndarray:
    """Inverse of split_stacked_planes: (table, monu) -> [2Vp, W] fat
    container in the plane-major (n_shards=1) or shard-major layout."""
    if n_shards == 1:
        return jnp.concatenate([table, monu])
    Vp, W = table.shape
    r = Vp // n_shards
    return jnp.stack(
        [table.reshape(n_shards, r, W), monu.reshape(n_shards, r, W)],
        axis=1,
    ).reshape(2 * Vp, W)


def stacked_table_rows(phys: jnp.ndarray, Vp: int, n_shards: int = 1):
    """Map physical table row ids to their global row in the folded
    container: identity at n_shards=1; (p//r)*2r + p%r shard-major."""
    if n_shards == 1:
        return phys
    r = Vp // n_shards
    return (phys // r) * (2 * r) + (phys % r)


def to_split_state(st):
    """Canonical (mu, nu) layout for checkpoints: the packed bf16-pair
    layout is a PLATFORM-dependent runtime choice (auto table_update picks
    it on TPU only), so checkpoints always store the split form and the
    loader re-packs — otherwise a TPU-written checkpoint could not restore
    on CPU (pytree structure mismatch).  unpack/pack are bitcasts, so the
    round-trip is bit-exact."""
    if isinstance(st, SparseAdamPackedState):
        mu, nu = unpack_monu(st.monu)
        return SparseAdamState(mu=mu, nu=nu, count=st.count)
    return st


def to_runtime_state(st, packed: bool):
    """Inverse of to_split_state for the current runtime layout."""
    if packed and isinstance(st, SparseAdamState):
        return SparseAdamPackedState(
            monu=pack_monu(st.mu.astype(jnp.bfloat16),
                           st.nu.astype(jnp.bfloat16)),
            count=st.count,
        )
    return st


def sparse_adam_row_update(
    table: jnp.ndarray,
    g_table: jnp.ndarray,
    flat_ids: jnp.ndarray,  # [K] rows touched this batch (duplicates OK)
    state: SparseAdamState,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    count = state.count + 1
    t = count.astype(jnp.float32)
    mdt = state.mu.dtype  # moment storage dtype (may be bf16; math in f32)
    g_rows = jnp.take(g_table, flat_ids, axis=0)
    mu_rows = jnp.take(state.mu, flat_ids, axis=0).astype(jnp.float32)
    nu_rows = jnp.take(state.nu, flat_ids, axis=0).astype(jnp.float32)
    mu_rows = b1 * mu_rows + (1.0 - b1) * g_rows
    nu_rows = b2 * nu_rows + (1.0 - b2) * g_rows * g_rows
    mu_hat = mu_rows / (1.0 - b1**t)
    nu_hat = nu_rows / (1.0 - b2**t)
    update_rows = lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
    table_rows = jnp.take(table, flat_ids, axis=0) - update_rows
    return (
        table.at[flat_ids].set(table_rows),
        SparseAdamState(
            mu=state.mu.at[flat_ids].set(mu_rows.astype(mdt)),
            nu=state.nu.at[flat_ids].set(nu_rows.astype(mdt)),
            count=count,
        ),
    )


# ---------------------------------------------------------------------------
# Two-phase embedding step (docs/perf_notes.md "two-phase gathered-rows
# differentiation"): the trainer pre-gathers the batch's rows, differentiates
# the loss w.r.t. the GATHERED rows (injected into the model via the
# ``injected`` flax collection, ops/embedding.py), and this module applies
# exact SparseAdam to only the touched rows.  No [V, D] cotangent, moment, or
# update buffer is ever materialized — the only whole-table ops left are the
# in-place scatter-adds of [K]-row deltas.
#
# Exact duplicate handling without an in-program unique() (sort/cumsum cost
# ~11.6 ms for 65k keys on this backend): batch composition is host-known
# (fit stages the dataset and generates the shuffle order itself), so the
# host precomputes per-batch `inv` (first-occurrence position of each id)
# and `rep` (1.0 at first occurrences).  On device, scatter-adding g_rows at
# `inv` inside a [K, D] buffer yields the per-unique-id gradient SUM at
# representative positions; all updates are then written as rep-masked
# scatter-ADDs of deltas, which duplicate ids cannot corrupt.
# ---------------------------------------------------------------------------


def batch_dedup_metadata(flat_ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side per-batch duplicate metadata.

    flat_ids: [steps, K] int — fused-table logical row ids per batch.
    Returns (inv [steps, K] int32, rep [steps, K] float32): inv[b, j] is the
    position of the first occurrence of flat_ids[b, j] within batch b, and
    rep[b, j] is 1.0 iff j IS that first occurrence.
    """
    return batch_step_metadata(flat_ids)[:2]


def _quantized_cap(need: int) -> int:
    """256 * 2^k shape quantum for the route residual caps (see the R_cap
    comment inside batch_step_metadata)."""
    cap = 256
    while cap < need:
        cap *= 2
    return cap


def _native_step_metadata(comp, idx_bits, pack_factor, Kp, want_route,
                          r_cap_min):
    """Single-pass C++ metadata (native/step_metadata.cpp) from the sorted
    composite; output-identical to the numpy formulation below."""
    from ..native import step_metadata_counts, step_metadata_fill

    steps, K = comp.shape
    comp = np.ascontiguousarray(comp)
    inv = np.empty((steps, K), np.int32)
    rep = np.empty((steps, K), np.float32)
    pids = np.empty((steps, Kp), np.int32)
    pinv = np.empty((steps, K), np.int32)
    nuniq = np.empty((steps, 1), np.int32)
    prep = np.empty((steps, K), np.float32)
    if not want_route:
        step_metadata_fill(comp, idx_bits, pack_factor, Kp, 0, 0,
                           inv, rep, pids, pinv, nuniq, prep,
                           None, None, None, None, None)
        return inv, rep, pids, pinv, nuniq, prep
    n_resid, n_ldup = step_metadata_counts(comp, idx_bits, pack_factor)
    R_cap = _quantized_cap(max(int(n_resid.max(initial=0)), int(r_cap_min)))
    G_cap = _quantized_cap(max(int(n_ldup.max(initial=0)), int(r_cap_min)))
    accperm = np.zeros((steps, Kp), np.int32)
    resid_pos = np.zeros((steps, R_cap), np.int32)
    resid_slot = np.full((steps, R_cap), Kp, np.int32)  # Kp = drop
    gdup_pos = np.zeros((steps, G_cap), np.int32)
    gdup_tgt = np.full((steps, G_cap), K, np.int32)  # K = drop
    step_metadata_fill(comp, idx_bits, pack_factor, Kp, R_cap, G_cap,
                       inv, rep, pids, pinv, nuniq, prep,
                       accperm, resid_pos, resid_slot, gdup_pos, gdup_tgt)
    return (inv, rep, pids, pinv, nuniq, prep, accperm, resid_pos,
            resid_slot, gdup_pos, gdup_tgt)


def batch_step_metadata(
    flat_ids: np.ndarray,
    pack_factor: int | None = None,
    n_phys_rows: int | None = None,
    chunk: int = 256,
    want_route: bool = False,
    r_cap_min: int = 0,
    use_native: bool | None = None,
):
    """All host-side per-batch metadata from ONE batched argsort.

    At production K (65k ids/batch) the two separate np.unique calls of
    batch_dedup_metadata + batch_phys_metadata cost ~15.6 ms/batch — more
    than the 9.7 ms device step they feed.  This computes (inv, rep) and,
    when ``pack_factor``/``n_phys_rows`` are given, (pids, pinv, nuniq) from
    a single np.argsort over all batches: with a STABLE sort the first
    element of each equal-value run is the first occurrence, and the sorted
    physical ids (flat // P, monotone under sort) yield the unique-physical
    slots as their run index.

    ``want_route=True`` additionally returns the GATHER-ROUTE dedup
    metadata (accperm [steps, Kp], resid_pos / resid_slot [steps, R_cap]):
    the device-side accumulation ``zeros[Kp].at[pinv].add(contrib)`` is,
    per slot, ONE designated contributor plus rare residuals, so it can be
    computed as ``contrib[accperm]`` (an 8.8 ns/row gather on this backend,
    probe_row_gather_scan.py) plus a small residual scatter-add — bitwise
    identical (int32 payload adds commute) and strictly cheaper than the
    full XLA scatter whenever duplicates are a minority.  accperm[i] is the
    original position of slot i's first physical contributor (pads -> 0,
    skipped by the kernel's n_real); resid holds every other contributor's
    (position, slot), padded to R_cap (shared across the call's batches,
    rounded to a multiple of 256) with (0, Kp) — slot Kp drops.

    want_route also returns (gdup_pos, gdup_tgt) [steps, G_cap]: the
    LOGICAL-duplicate residual pairs for the gradient-sum route.  The
    gradient dedup ``zeros[K].at[inv].add(g)`` scatters ALL K rows when
    only the duplicates need routing (588 us of the 40M step,
    probe_40m_wide_stages.py round 4); since inv[j] == j at first
    occurrences, ``g.at[gdup_tgt].add(g[gdup_pos])`` produces the same
    sums at every first occurrence with an ~n_dups-row scatter.  Pairs are
    (position of each NON-first logical occurrence, its first-occurrence
    position), padded with (0, K) — target K drops.  Non-first positions
    then hold g[j] instead of 0, which every consumer masks (rep/own).
    """
    steps, K = flat_ids.shape
    flat = np.asarray(flat_ids, np.int64)  # no copy when already int64
    # stable value-sort with index tracking via ONE plain np.sort of a
    # (value << idx_bits | index) composite: np.argsort costs ~6.5 ms per
    # 65k-row batch while np.sort costs ~0.3 ms (no index permutation
    # array to maintain), and stability falls out of the composite order.
    idx_bits = max(1, int(K - 1).bit_length())
    assert int(flat.max(initial=0)) < (1 << (63 - idx_bits)), "id overflow"
    comp = np.sort((flat << idx_bits) | np.arange(K, dtype=np.int64), axis=1)
    want_phys = pack_factor is not None
    if want_phys:
        if n_phys_rows is None:
            raise ValueError("n_phys_rows required with pack_factor")
        Kp_n = -(-K // chunk) * chunk
        if n_phys_rows <= Kp_n:
            raise ValueError(
                f"unique-update metadata needs n_phys_rows > {Kp_n}, "
                f"got {n_phys_rows}"
            )
        if use_native is not False:
            # single-pass C++ kernel (native/step_metadata.cpp): the numpy
            # formulation below needs ~10 full passes at 4.6-6.4 ms per
            # 65k-id batch — slower than the 2.5 ms device step it feeds;
            # the native pass is ~L2-resident and threads over batches.
            # Output-identical (test_native_step_metadata_matches_numpy).
            from ..native import NativeUnavailable

            try:
                return _native_step_metadata(
                    comp, idx_bits, pack_factor, Kp_n, want_route, r_cap_min)
            except NativeUnavailable:
                if use_native:  # explicit request -> surface the failure
                    raise
    order = (comp & ((1 << idx_bits) - 1)).astype(np.int32)
    svals = comp >> idx_bits
    newv = np.ones((steps, K), bool)
    newv[:, 1:] = svals[:, 1:] != svals[:, :-1]
    inv = np.empty((steps, K), np.int32)
    rep = np.zeros((steps, K), np.float32)
    if want_phys:
        Kp = Kp_n
        psvals = svals // pack_factor  # still sorted (// is monotone)
        pnew = np.ones((steps, K), bool)
        pnew[:, 1:] = psvals[:, 1:] != psvals[:, :-1]
        # phys slot per SORTED position (unique phys rows in ascending order)
        pgrp = np.cumsum(pnew, axis=1, dtype=np.int32) - 1
        pids = np.empty((steps, Kp), np.int32)
        pinv = np.empty((steps, K), np.int32)
        nuniq = np.empty((steps, 1), np.int32)
        prep = np.empty((steps, K), np.float32)
        if want_route:
            # residuals list only positions whose CONTRIBUTION can be
            # nonzero: the update's per-position contribution is
            # where(own, new-old, 0) + prep*old (two_phase_sparse_adam_
            # unique), and own == own_mask & rep — so a position that is
            # neither logical-first (rep) nor physical-first (prep)
            # contributes EXACTLY ZERO int32 to both planes.  Dropping
            # those entries is bitwise-exact (int32 add of 0) and shrinks
            # R at heavy duplication from K - n_phys to
            # n_logical - n_phys (zipf-1.1 40M batch: 27.9k -> 4.4k,
            # probe_zipf_contention.py round 4).  The physical-first
            # position is always also logical-first (the stable sort puts
            # each physical run's first element at its smallest logical
            # id's first occurrence), so the residual set is
            # logical-first & ~physical-first.
            n_resid = ((newv & ~pnew).sum(axis=1)).astype(np.int64)
            # R_cap determines the resid_pos/resid_slot SHAPES, which the
            # jitted step program is specialized on — a drifting cap would
            # retrace (a 5-390 s remote compile per occurrence on this
            # backend).  Quantize to 256 * 2^k so at most ~log2(K/256)
            # distinct shapes exist, and honor the caller's monotone floor
            # (the Trainer passes the largest cap it has seen, r_cap_min).
            def quantized_cap(need):
                cap = 256
                while cap < need:
                    cap *= 2
                return cap

            R_cap = quantized_cap(
                max(int(n_resid.max(initial=0)), int(r_cap_min)))
            accperm = np.zeros((steps, Kp), np.int32)
            resid_pos = np.zeros((steps, R_cap), np.int32)
            resid_slot = np.full((steps, R_cap), Kp, np.int32)  # Kp = drop
            n_ldup = (K - newv.sum(axis=1)).astype(np.int64)
            G_cap = quantized_cap(
                max(int(n_ldup.max(initial=0)), int(r_cap_min)))
            gdup_pos = np.zeros((steps, G_cap), np.int32)
            gdup_tgt = np.full((steps, G_cap), K, np.int32)  # K = drop
    # ---- vectorized-over-batches core (round 4b) ----
    # The per-batch fancy-indexing loop cost ~4-7 ms/batch at K=65k —
    # MORE than the 2.5 ms device step it feeds, making full-shuffle fits
    # host-bound.  The run-start spreading and all position-space scatters
    # are batch-vectorizable: run-start POSITIONS are monotone, so a
    # maximum.accumulate forward-fill spreads each run's first sorted
    # index, and put_along_axis replaces every `arr[b, order[b]] = x`
    # scatter.  Only the ragged extractions (pids/accperm/resid/gdup
    # lists) stay in a per-batch loop — contiguous mask-compressions, not
    # per-element indexing.  Output-identical to the loop form (pinned by
    # the existing metadata tests).
    pos = np.arange(K, dtype=np.int32)[None, :]
    start_pos = np.maximum.accumulate(np.where(newv, pos, 0), axis=1)
    # original index of each run's FIRST element, spread over the run
    fs_sorted = np.take_along_axis(order, start_pos, axis=1)
    np.put_along_axis(inv, order, fs_sorted, axis=1)
    np.put_along_axis(rep, order, newv.astype(np.float32), axis=1)
    if want_phys:
        np.put_along_axis(pinv, order, pgrp, axis=1)
        np.put_along_axis(prep, order, pnew.astype(np.float32), axis=1)
        nuniq[:, 0] = pnew.sum(axis=1, dtype=np.int32)
    for b in range(steps if want_phys else 0):
        ob, nb = order[b], newv[b]
        if want_phys:
            u = psvals[b][pnew[b]]
            U = len(u)
            pids[b, :U] = u
            if want_route:
                accperm[b, :U] = ob[pnew[b]]
                # logical-first & ~physical-first: the only positions with
                # a possibly-nonzero contribution (see n_resid above)
                nb_res = nb & ~pnew[b]
                R = int(nb_res.sum())
                resid_pos[b, :R] = ob[nb_res]
                resid_slot[b, :R] = pgrp[b][nb_res]
                ldm = ~nb  # non-first LOGICAL occurrences (sorted order)
                L = int(ldm.sum())
                gdup_pos[b, :L] = ob[ldm]
                gdup_tgt[b, :L] = fs_sorted[b][ldm]
            if U < Kp:
                # distinct untouched rows at the TAIL (see
                # batch_phys_metadata): the first non-members of u in
                # [0, Kp] via an O(Kp) presence mask (setdiff1d re-sorts
                # and costs ~2 ms/batch at K=65k)
                present = np.zeros(Kp + 1, bool)
                present[u[u <= Kp]] = True
                pids[b, U:] = np.flatnonzero(~present)[: Kp - U]
    if want_phys:
        if want_route:
            return (inv, rep, pids, pinv, nuniq, prep, accperm, resid_pos,
                    resid_slot, gdup_pos, gdup_tgt)
        return inv, rep, pids, pinv, nuniq, prep
    return inv, rep


def device_step_metadata(
    flat_ids: jnp.ndarray,  # [K] int32 logical fused-table row ids
    pack_factor: int,
    Kp: int,
    n_phys_rows: int,
):
    """ON-DEVICE per-batch dedup metadata (round 5): the device analogue of
    ``batch_step_metadata``'s (inv, rep, pids, pinv, nuniq, prep), computed
    inside the step program from one stable two-operand ``lax.sort``.

    Why: the full-shuffle fit uploads ~125 MB/epoch of host metadata
    (compacted) through a relay that SERIALIZES transfers against
    dispatches — epochs alternate device-bound and upload-stalled
    (docs/perf_notes.md round-5 40M traces).  Computing the metadata on
    device trades that for ~one 65k-row sort + a few segment ops per
    step, entirely inside the scanned dispatch.

    Differences from the host form (both deliberate):
    * pids' tail pads are ``n_phys_rows`` (one past the last row) instead
      of distinct untouched rows — valid ONLY for consumers that never
      touch pad slots: the write kernels' per-row bounds predicates and
      XLA scatters in drop mode.  The legacy ``unique_indices`` XLA
      scatter fallback and the chunk-granular RMW kernel are NOT safe
      with these pads (duplicate out-of-range indices), so the trainer
      restricts device metadata to the pallas write path / plain scatter.
    * the gather-route dedup lists (accperm/resid/gdup) are not built —
      their ragged compaction has data-dependent shapes; device metadata
      pairs with ``dedup_route="scatter"``.

    inv/rep/pinv/prep/nuniq are BITWISE identical to the host values (the
    stable sort orders equal keys identically), so training results are
    bitwise equal to the host-metadata path wherever pads are unused
    (pinned by tests/test_device_metadata.py).
    """
    K = flat_ids.shape[0]
    P = pack_factor
    k = jnp.arange(K, dtype=jnp.int32)
    svals, order = jax.lax.sort(
        (flat_ids.astype(jnp.int32), k), num_keys=1, is_stable=True
    )
    newv = jnp.concatenate(
        [jnp.ones((1,), bool), svals[1:] != svals[:-1]])
    # original index of each run's FIRST element, spread over the run
    start_pos = jax.lax.cummax(jnp.where(newv, k, 0))
    fs_sorted = jnp.take(order, start_pos)
    inv = jnp.zeros((K,), jnp.int32).at[order].set(fs_sorted)
    rep = jnp.zeros((K,), jnp.float32).at[order].set(
        newv.astype(jnp.float32))
    psvals = svals // P if P > 1 else svals
    pnew = (
        jnp.concatenate([jnp.ones((1,), bool), psvals[1:] != psvals[:-1]])
        if P > 1 else newv
    )
    pgrp = jnp.cumsum(pnew.astype(jnp.int32)) - 1
    pinv = jnp.zeros((K,), jnp.int32).at[order].set(pgrp)
    prep = jnp.zeros((K,), jnp.float32).at[order].set(
        pnew.astype(jnp.float32))
    nuniq = jnp.sum(pnew.astype(jnp.int32)).reshape(1)
    # unique physical rows at their slots; tail pads = n_phys_rows (write
    # kernels' bounds predicates skip slots >= nuniq; gathers clip)
    pids = jnp.full((Kp,), n_phys_rows, jnp.int32).at[pgrp].set(
        psvals.astype(jnp.int32), mode="drop")
    return inv, rep, pids, pinv, nuniq, prep


def batch_phys_metadata(
    flat_ids: np.ndarray,
    pack_factor: int,
    n_phys_rows: int,
    chunk: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side unique-PHYSICAL-row metadata for the fused table update.

    The big-array cost of the two-phase step is the scatter-adds at
    ``flat_ids // pack_factor`` (duplicates allowed).  This precomputes, per
    batch, a duplicate-free *sorted* physical row list so the device update
    can (a) pass ``unique_indices=True`` to XLA's
    scatter or (b) drive the Pallas rows-RMW kernel, whose contract requires
    unique rows (ops/pallas_scatter.py).

    flat_ids: [steps, K] logical fused-table row ids.
    Returns (pids [steps, Kp] int32, pinv [steps, K] int32,
    nuniq [steps, 1] int32) with Kp = ceil(K / chunk) * chunk:

    * pids[b]: slots [0, nuniq) hold batch b's unique physical rows sorted
      ascending; tail slots hold DISTINCT physical rows the batch does not
      touch (the whole list stays strictly unique — pad rows receive zero /
      unmasked deltas and are rewritten unchanged, and the kernel can skip
      them entirely via its n_real argument);
    * pinv[b, j]: the slot of flat_ids[b, j]'s physical row within pids[b];
    * nuniq[b, 0]: the unique count — slots >= nuniq are padding;
    * prep[b, j]: 1.0 iff j is the FIRST occurrence of its PHYSICAL row —
      the updater folds each touched row's old contents into its
      accumulation buffers through exactly one contributor with this mask.

    The list is NOT globally sorted (pads sit at the tail whatever their
    value), so callers must not claim ``indices_are_sorted`` to XLA; the
    kernel contract only needs uniqueness.

    Requires n_phys_rows > Kp (always true at the large vocabularies where
    the unique-update path is worth enabling).
    """
    return batch_step_metadata(
        flat_ids, pack_factor, n_phys_rows, chunk=chunk
    )[2:5]


def gather_rows(table: jnp.ndarray, flat_ids: jnp.ndarray, dim: int, pack_factor: int):
    """[K] logical ids -> [K, dim] rows from a (possibly lane-packed) table."""
    if pack_factor == 1:
        return jnp.take(table, flat_ids, axis=0)
    P = pack_factor
    sup = jnp.take(table, flat_ids // P, axis=0)  # [K, P*dim]
    sub = jax.nn.one_hot(flat_ids % P, P, dtype=table.dtype)
    return jnp.einsum("kp,kpd->kd", sub, sup.reshape(-1, P, dim))


def _scatter_add_rows(
    arr: jnp.ndarray, flat_ids: jnp.ndarray, delta: jnp.ndarray, pack_factor: int
):
    """arr.at[logical rows] += delta, for plain or lane-packed layouts."""
    if pack_factor == 1:
        return arr.at[flat_ids].add(delta)
    P = pack_factor
    dim = delta.shape[-1]
    sub = jax.nn.one_hot(flat_ids % P, P, dtype=delta.dtype)
    wide = jnp.einsum("kp,kd->kpd", sub, delta).reshape(delta.shape[0], P * dim)
    return arr.at[flat_ids // P].add(wide)


def two_phase_sparse_adam(
    table: jnp.ndarray,
    g_rows: jnp.ndarray,  # [K, D] cotangent w.r.t. the gathered rows
    flat_ids: jnp.ndarray,  # [K] logical row ids (duplicates OK)
    inv: jnp.ndarray,  # [K] first-occurrence positions (host-computed)
    rep: jnp.ndarray,  # [K] 1.0 at first occurrences
    state: SparseAdamState,
    lr: float,
    pack_factor: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """Exact SparseAdam from row cotangents; all whole-table traffic is two
    [K]-row scatter-adds (table) + four row gathers/scatters (moments)."""
    dim = g_rows.shape[-1]
    count = state.count + 1
    t = count.astype(jnp.float32)
    mdt = state.mu.dtype  # moment storage dtype (may be bf16; math in f32)
    # per-unique-id gradient sums at representative positions
    g_sum = jnp.zeros_like(g_rows).at[inv].add(g_rows)
    mu_rows = gather_rows(state.mu, flat_ids, dim, pack_factor)
    nu_rows = gather_rows(state.nu, flat_ids, dim, pack_factor)
    mu_f = mu_rows.astype(jnp.float32)
    nu_f = nu_rows.astype(jnp.float32)
    new_mu = b1 * mu_f + (1.0 - b1) * g_sum
    new_nu = b2 * nu_f + (1.0 - b2) * g_sum * g_sum
    mu_hat = new_mu / (1.0 - b1**t)
    nu_hat = new_nu / (1.0 - b2**t)
    r = rep[:, None]
    table = _scatter_add_rows(
        table, flat_ids, -lr * mu_hat / (jnp.sqrt(nu_hat) + eps) * r, pack_factor
    )
    mu = _scatter_add_rows(
        state.mu, flat_ids, (new_mu.astype(mdt) - mu_rows) * r.astype(mdt),
        pack_factor,
    )
    nu = _scatter_add_rows(
        state.nu, flat_ids, (new_nu.astype(mdt) - nu_rows) * r.astype(mdt),
        pack_factor,
    )
    return table, SparseAdamState(mu=mu, nu=nu, count=count)


def two_phase_sparse_adam_slot(
    table: jnp.ndarray,  # [2Vp, W] folded table+moment container
    g_rows: jnp.ndarray,  # [K, D] cotangent w.r.t. the gathered rows
    flat_ids: jnp.ndarray,  # [K] logical row ids (duplicates OK)
    rep: jnp.ndarray,  # [K] 1.0 at first occurrences
    pids: jnp.ndarray,  # [Kp] unique sorted PHYSICAL rows
    n_real,  # [1] int32: pids[n_real:] are padding
    sup_slot: jnp.ndarray,  # [Kp, W] old table rows AT SLOTS (pair-gather)
    monu_slot: jnp.ndarray,  # [Kp, W] old container rows AT SLOTS
    state: "SparseAdamFoldedState",
    lr: float,
    accperm: jnp.ndarray,  # [Kp] designated (phys-first) contributor pos
    resid_pos: jnp.ndarray,  # [R_cap] pruned residual positions
    resid_slot: jnp.ndarray,  # [R_cap] their slots (Kp = drop)
    gdup_pos: jnp.ndarray,  # [G_cap] logical-dup gradient positions
    gdup_tgt: jnp.ndarray,  # [G_cap] their first-occurrence targets
    pack_factor: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
    chunk: int = 256,
):
    """SLOT-SPACE SparseAdam for the stacked container (round 4).

    two_phase_sparse_adam_unique computes everything in POSITION space
    [K, W] and int32-routes two accumulated contribution planes to slots.
    This variant instead routes ONE plane — the masked wide gradient —
    plus a [K, P] lane-ownership plane, and runs the whole wide-lane Adam
    chain directly at slot granularity on the slot-gathered old rows
    (ops/pallas_gather.py pallas_rows_gather_dual by ``pids`` with
    ``n_real`` skip).  Wins scale with duplication: the pair-gather and
    the math touch n_phys_unique rows instead of K (33k vs 65k at
    zipf-1.1 on the 40M batch) and the route moves half the plane bytes.

    Bitwise-identical to the position path: per owned lane the identical
    scalar op chain runs on identical inputs (the slot row's bits == the
    position row's bits; the routed gradient lane == acc_contrib's lane),
    non-owned/untouched lanes keep their exact old bits via selects, and
    pad slots (garbage under Mosaic's skipped gather) are never written
    (write kernel n_real).  Pinned by
    test_trainer_update_space_slot_matches_position.

    Requires the PRUNED residual metadata (logical-first & ~phys-first,
    batch_step_metadata round 4): each (slot, lane) then has exactly one
    possibly-nonzero contributor, so int32 routing places the gradient
    bits exactly.  (Unpruned metadata also works — the extra contributors
    carry zero — it is just slower.)

    Reference parity: same exact SparseAdam the reference's dense Adam
    cannot run at this scale (model/basemodel.py:569-584).
    """
    from ..ops.pallas_scatter import pallas_rows_write_dual

    dim = g_rows.shape[-1]
    K = g_rows.shape[0]
    P = pack_factor
    W = table.shape[1]
    assert table.shape[0] % 2 == 0, table.shape
    Vp = table.shape[0] // 2
    Kp = pids.shape[0]
    count = state.count + 1
    t = count.astype(jnp.float32)

    # per-unique-logical-id gradient sums at first occurrences (gdup route)
    g_sum = g_rows.at[gdup_tgt].add(g_rows[gdup_pos], mode="drop")
    rep_b = rep > 0
    if P > 1:
        own_mask = (
            (jnp.arange(P * dim, dtype=jnp.int32) // dim)[None, :]
            == (flat_ids % P).astype(jnp.int32)[:, None]
        )  # [K, W]
        g_wide = jnp.broadcast_to(
            g_sum[:, None, :], (K, P, dim)).reshape(K, W)
        gw = jnp.where(own_mask & rep_b[:, None], g_wide, 0.0)
        ow = (
            (jnp.arange(P, dtype=jnp.int32)[None, :]
             == (flat_ids % P).astype(jnp.int32)[:, None])
            & rep_b[:, None]
        ).astype(jnp.int32)  # [K, P]
    else:
        gw = jnp.where(rep_b[:, None], g_sum, 0.0)
        ow = rep_b[:, None].astype(jnp.int32)  # [K, 1]

    # ONE-plane int32 route: each (slot, lane) has at most one nonzero
    # contributor (the owning logical id's first occurrence), so integer
    # adds place the f32 bits exactly (-0.0 and NaN payloads included)
    gwi = jax.lax.bitcast_convert_type(gw, jnp.int32)
    g_slot = jax.lax.bitcast_convert_type(
        gwi[accperm].at[resid_slot].add(gwi[resid_pos], mode="drop"),
        jnp.float32,
    )  # [Kp, W]
    ow_slot = ow[accperm].at[resid_slot].add(
        ow[resid_pos], mode="drop")  # [Kp, P or 1]
    touched = jnp.broadcast_to(
        (ow_slot > 0)[:, :, None], (Kp, ow_slot.shape[1], W // ow_slot.shape[1])
    ).reshape(Kp, W)

    # wide-lane Adam chain at SLOT granularity — per owned lane the same
    # scalar sequence as the position path (bitwise pins hold); untouched
    # lanes compute garbage that the selects below discard
    mu_w, nu_w = unpack_monu_f32(monu_slot)
    new_mu_w = b1 * mu_w + (1.0 - b1) * g_slot
    new_nu_w = b2 * nu_w + (1.0 - b2) * g_slot * g_slot
    mu_hat_w = new_mu_w / (1.0 - b1**t)
    nu_hat_w = new_nu_w / (1.0 - b2**t)
    d_w = -lr * mu_hat_w / (jnp.sqrt(nu_hat_w) + eps)
    # selects, not adds: untouched lanes keep their exact old BITS (an
    # f32 `old + 0.0` would canonicalize -0.0)
    new_t = jnp.where(touched, sup_slot + d_w, sup_slot)
    new_monu = jnp.where(
        touched, pack_monu_rounded(new_mu_w, new_nu_w), monu_slot)
    new_stacked = pallas_rows_write_dual(
        table.reshape(2, Vp, W),
        pids,
        jnp.stack([new_t, new_monu]),
        n_real=n_real,
        chunk=min(chunk, Kp),
        interpret=interpret,
    )
    return new_stacked.reshape(table.shape), SparseAdamFoldedState(count=count)


def two_phase_sparse_adam_unique(
    table: jnp.ndarray,
    g_rows: jnp.ndarray,  # [K, D] cotangent w.r.t. the gathered rows
    flat_ids: jnp.ndarray,  # [K] logical row ids (duplicates OK)
    inv: jnp.ndarray,  # [K] first-occurrence positions (host-computed)
    rep: jnp.ndarray,  # [K] 1.0 at first occurrences
    pids: jnp.ndarray,  # [Kp] unique sorted PHYSICAL rows (host-computed)
    pinv: jnp.ndarray,  # [K] slot of each logical id's physical row in pids
    state: SparseAdamState,
    lr: float,
    pack_factor: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    use_pallas: bool = False,
    interpret: bool = False,
    chunk: int = 256,
    n_real=None,  # [1] int32: pids[n_real:] are padding (kernel skips them)
    sup=None,  # [K, W] phase-1 TABLE super-rows (reused; else re-gathered)
    sup_c=None,  # [K, W] moment-container rows (dual pair-gather; else here)
    prep=None,  # [K] 1.0 at each PHYSICAL row's first occurrence
    monu_gather: str = "xla",  # "xla" | "pallas": moment-container gather
    accperm=None,  # [Kp] gather-route dedup (batch_step_metadata want_route)
    resid_pos=None,  # [R_cap] residual contributor positions
    resid_slot=None,  # [R_cap] residual target slots (Kp = drop)
    gdup_pos=None,  # [G_cap] logical-dup gradient residual positions
    gdup_tgt=None,  # [G_cap] their first-occurrence targets (K = drop)
):
    """two_phase_sparse_adam with duplicate-free big-array updates.

    Same SparseAdam math, but the per-logical-position deltas are first
    accumulated into a small [Kp, row] buffer at each id's unique-physical-
    row slot (host metadata from batch_phys_metadata), so the three
    whole-table updates touch each physical row exactly once.  That allows
    either XLA scatter-adds with ``unique_indices`` or the Pallas
    WRITE-ONLY row kernel (ops/pallas_scatter.py pallas_rows_write): the
    old rows are already in hand (the phase-1 table gather and the moment
    gather), so each touched row's complete new contents are computed in
    XLA and the kernel issues ONE write DMA per row — half the DMA issues
    of a read-modify-write, and the kernel is scalar-issue-bound
    (docs/perf_notes.md).

    Exactness: colliding logical ids within a physical row occupy disjoint
    lanes (same lane would mean the same logical id, which rep masks), so
    the pre-accumulation reorders no floating-point sums.
    """
    dim = g_rows.shape[-1]
    K = g_rows.shape[0]
    P = pack_factor
    folded = isinstance(state, SparseAdamFoldedState)
    packed = isinstance(state, SparseAdamPackedState) or folded
    if folded:
        assert use_pallas, "table_container='stacked' requires the pallas update"
        assert table.shape[0] % 2 == 0, table.shape
        Vp = table.shape[0] // 2
    count = state.count + 1
    t = count.astype(jnp.float32)
    mdt = jnp.bfloat16 if packed else state.mu.dtype
    if gdup_pos is not None:
        # routed gradient dedup: the full [K] inv-scatter costs ~9 ns/row
        # (588 us of the 40M step) when only the logical duplicates need
        # routing.  Same pairwise-add order as the inv-scatter at every
        # first occurrence (see batch_step_metadata), garbage at non-first
        # positions that every consumer masks via rep/own.
        g_sum = g_rows.at[gdup_tgt].add(g_rows[gdup_pos], mode="drop")
    else:
        g_sum = jnp.zeros_like(g_rows).at[inv].add(g_rows)
    Kp = pids.shape[0]
    row_width = table.shape[1]
    r = rep[:, None]
    # lane-ownership as a broadcast+select instead of a one-hot
    # outer-product einsum.  x * onehot == where(mask, x, 0) bitwise for
    # finite x (exact 1.0/0.0 multiplies; every equality test pins it).
    own_mask = (
        ((jnp.arange(P * dim, dtype=jnp.int32) // dim)[None, :]
         == (flat_ids % P).astype(jnp.int32)[:, None])
        if P > 1 else None
    )  # [K, W] bool: lane belongs to this logical id's sub-row

    def _tile(x):
        return jnp.broadcast_to(
            x[:, None, :], (K, P, x.shape[-1])).reshape(K, P * x.shape[-1])

    def acc_contrib(delta):
        """[K, dim] logical delta -> [K, W] physical-lane contribution."""
        if P > 1:
            return jnp.where(own_mask, _tile(delta), 0.0)
        return delta

    if packed:
        # ONE gather of the f32 container rows carries both bf16 moments
        # (folded: the container rows live at table[Vp + gid]).  The
        # monu_gather="pallas" routing exists for A/Bs but measured SLOWER
        # than XLA's take (12.7 vs 8.8 ns/row scan-amortized,
        # probe_row_gather_scan.py round 3 — XLA's 128-lane gather is
        # already near its DMA path; only scatter/writes favor pallas), so
        # the trainer auto-resolves it to "xla".
        gids = flat_ids // P if P > 1 else flat_ids
        monu_src = table if folded else state.monu
        monu_ids = Vp + gids if folded else gids
        if sup_c is not None:
            pass  # caller supplied the container rows (dual pair-gather)
        elif monu_gather == "pallas" and K % 256 == 0:
            from ..ops.pallas_gather import pallas_rows_gather_hbm

            sup_c = pallas_rows_gather_hbm(
                monu_src, monu_ids.astype(jnp.int32), interpret=interpret
            )  # [K, W] f32 container
        else:
            sup_c = jnp.take(monu_src, monu_ids, axis=0)  # [K, W] f32
        # The packed Adam math runs at FULL LANE WIDTH [K, W] (round 4):
        # the moments unpack straight to f32 via same-shape integer shifts
        # (unpack_monu_f32), the gradient is widened ONCE, and the update
        # chain runs on every lane — per owned lane this is the identical
        # scalar op sequence as the old narrow [K, dim] path (so every
        # bitwise pin holds), while non-owned lanes compute garbage that
        # the own/rep selects below mask out.  This removes the one-hot
        # einsum selections and the narrow->select->widen broadcast chain
        # the HLO ledger attributed ~340-570 MB/step to
        # (docs/perf_notes.md "40M step HLO buffer ledger").  FLOPs go up
        # P-fold; the step is HBM-bound with 40x MXU headroom.
        mu_w, nu_w = unpack_monu_f32(sup_c)  # f32 [K, W]
        g_w = acc_contrib(g_sum)  # [K, W] gradient sums at owned lanes
        new_mu_w = b1 * mu_w + (1.0 - b1) * g_w
        new_nu_w = b2 * nu_w + (1.0 - b2) * g_w * g_w
        mu_hat_w = new_mu_w / (1.0 - b1**t)
        nu_hat_w = new_nu_w / (1.0 - b2**t)
        d_table_w = -lr * mu_hat_w / (jnp.sqrt(nu_hat_w) + eps) * r
        # new container values: bf16-rounded (mu, nu) pairs re-packed with
        # same-shape integer ops; non-owned lanes hold garbage masked by
        # ``own``.  Accumulation at unique slots is done in int32
        # (payloads are opaque bitpatterns; disjoint-lane integer adds are
        # exact and cannot canonicalize NaNs/denormals the way f32 adds
        # could).
        vals_c = pack_monu_rounded(new_mu_w, new_nu_w)  # [K, W] f32
        r_w = jnp.broadcast_to(r, (K, row_width))
        own = (
            jnp.where(own_mask, r_w, 0.0) if P > 1 else r_w
        )  # 1.0 at owned lanes of first occurrences

        def own_sel(x):
            """Zero a wide [K, W] buffer's non-owned lanes."""
            return jnp.where(own_mask, x, 0.0) if P > 1 else x

        if use_pallas:
            from ..ops.pallas_scatter import pallas_rows_write

            assert n_real is not None, "write-only kernel needs n_real"
            assert prep is not None, "pallas path needs the prep mask"
            if sup is None:
                sup = jnp.take(
                    table, flat_ids // P if P > 1 else flat_ids, axis=0
                )
            # Old-row fold with NO [Kp, W] monu base gather and NO own-mask
            # accumulation lanes: the old container rows are already in hand
            # from the phase-1 moment gather (sup_c), so each owned lane
            # rides as a WRAPPING int32 delta (new_bits - old_bits) and the
            # prep (physical-first) contributor adds the whole old row.
            # Per lane the accumulated sum is old + (new - old) = new when
            # owned (at most one owner per lane — colliding logical ids
            # occupy disjoint lanes and rep masks duplicates) and old
            # otherwise; int32 addition is exact modular arithmetic, so no
            # bitpattern can be corrupted.  The TABLE buffer rides the SAME
            # int32 fold: the owner computes its lanes' complete new f32
            # value old + delta FIRST (sup[k] holds the old physical row —
            # bit-identical at every k of the row), then contributes the
            # wrapping bit-delta, so the result is bitwise equal to the f32
            # scatter-sum it replaces (f32 add of the same two values).
            # That makes both buffers int32 with one contributor chain per
            # lane, so they merge into ONE [Kp, 2W] scatter — scatter cost
            # on this backend is per-OP, not per-byte (2.2x on the
            # accumulation portion, probe_acc_scatter_width.py).
            pr = prep[:, None]
            old_i = jax.lax.bitcast_convert_type(sup_c, jnp.int32)
            new_i = jax.lax.bitcast_convert_type(vals_c, jnp.int32)
            contrib_monu_i = (
                jnp.where(own > 0, new_i - old_i, 0)
                + prep.astype(jnp.int32)[:, None] * old_i
            )
            old_ti = jax.lax.bitcast_convert_type(sup, jnp.int32)
            new_t = sup + own_sel(d_table_w)
            contrib_t_i = (
                jnp.where(
                    own > 0,
                    jax.lax.bitcast_convert_type(new_t, jnp.int32) - old_ti,
                    0,
                )
                + prep.astype(jnp.int32)[:, None] * old_ti
            )
            if folded:
                # same int32 fold, accumulated directly in the dual layout
                # [2, Kp, W] (plane 0 = table, plane 1 = monu) so the
                # write kernel issues ONE [2, 1, 128] strided DMA per
                # touched row instead of two single-row copies
                from ..ops.pallas_scatter import pallas_rows_write_dual

                if accperm is not None:
                    # gather-route dedup: one designated contributor per
                    # slot via gather + a small residual scatter-add —
                    # bitwise equal (int32 adds commute), cheaper than the
                    # full scatter whenever duplicates are a minority.
                    # Routed PER PLANE: stacking the [2, K, 128] contrib
                    # planes first cost a pad + a defensive copy
                    # (~270 MB/step, HLO ledger in perf_notes); per-plane
                    # gathers alias their dying operands and only the
                    # final [2, Kp, 128] kernel input materializes.
                    def plane(c):
                        return c[accperm].at[resid_slot].add(
                            c[resid_pos], mode="drop")

                    accd = jnp.stack(
                        [plane(contrib_t_i), plane(contrib_monu_i)])
                else:
                    accd = jnp.zeros((2, Kp, row_width), jnp.int32).at[
                        :, pinv
                    ].add(jnp.stack([contrib_t_i, contrib_monu_i]))
                new_stacked = pallas_rows_write_dual(
                    table.reshape(2, Vp, row_width),
                    pids,
                    jax.lax.bitcast_convert_type(accd, jnp.float32),
                    n_real=n_real, chunk=min(chunk, Kp),
                    interpret=interpret,
                )
                return (
                    new_stacked.reshape(table.shape),
                    SparseAdamFoldedState(count=count),
                )
            if accperm is not None:
                # per-plane routing (no concat pad / scatter copy — see
                # the folded branch + perf_notes "Per-plane gather route")
                def plane2(c):
                    return jax.lax.bitcast_convert_type(
                        c[accperm].at[resid_slot].add(
                            c[resid_pos], mode="drop"),
                        jnp.float32,
                    )

                acc_t = plane2(contrib_t_i)
                acc_monu = plane2(contrib_monu_i)
            else:
                acc2 = jnp.zeros(
                    (Kp, 2 * row_width), jnp.int32).at[pinv].add(
                    jnp.concatenate(
                        [contrib_t_i, contrib_monu_i], axis=1))
                acc_t = jax.lax.bitcast_convert_type(
                    acc2[:, :row_width], jnp.float32
                )
                acc_monu = jax.lax.bitcast_convert_type(
                    acc2[:, row_width:], jnp.float32
                )
            table, monu = pallas_rows_write(
                (table, state.monu), pids, (acc_t, acc_monu),
                n_real=n_real, chunk=min(chunk, Kp), interpret=interpret,
            )
        else:
            vals_i = jnp.where(
                own > 0, jax.lax.bitcast_convert_type(vals_c, jnp.int32), 0
            )
            acc_vals = jax.lax.bitcast_convert_type(
                jnp.zeros((Kp, row_width), jnp.int32).at[pinv].add(vals_i),
                jnp.float32,
            )
            kw = dict(unique_indices=True)
            acc_mask = jnp.zeros(
                (Kp, row_width), jnp.float32).at[pinv].add(own)
            acc_t = jnp.zeros((Kp, row_width), jnp.float32).at[pinv].add(
                own_sel(d_table_w))
            table = table.at[pids].add(acc_t, **kw)
            old = jnp.take(state.monu, pids, axis=0, **kw)
            monu = state.monu.at[pids].set(
                jnp.where(acc_mask > 0, acc_vals, old), **kw
            )
        return table, SparseAdamPackedState(monu=monu, count=count)

    # ---- non-packed (split f32/bf16 moments): narrow [K, dim] math ----
    mu_rows = gather_rows(state.mu, flat_ids, dim, pack_factor)
    nu_rows = gather_rows(state.nu, flat_ids, dim, pack_factor)
    mu_f = mu_rows.astype(jnp.float32)
    nu_f = nu_rows.astype(jnp.float32)
    new_mu = b1 * mu_f + (1.0 - b1) * g_sum
    new_nu = b2 * nu_f + (1.0 - b2) * g_sum * g_sum
    mu_hat = new_mu / (1.0 - b1**t)
    nu_hat = new_nu / (1.0 - b2**t)
    d_table = -lr * mu_hat / (jnp.sqrt(nu_hat) + eps) * r
    d_mu = (new_mu.astype(mdt).astype(jnp.float32) - mu_f) * r
    d_nu = (new_nu.astype(mdt).astype(jnp.float32) - nu_f) * r

    def acc(delta, width):
        return jnp.zeros((Kp, width), jnp.float32).at[pinv].add(
            acc_contrib(delta))

    if use_pallas:
        from ..ops.pallas_scatter import pallas_rows_write

        assert n_real is not None, "write-only kernel needs n_real"
        assert prep is not None, "pallas path needs the prep mask"
        phys = flat_ids // P if P > 1 else flat_ids
        if sup is None:
            sup = jnp.take(table, phys, axis=0)
        # the moment super-row takes CSE with gather_rows' internal takes
        sup_mu = jnp.take(state.mu, phys, axis=0).astype(jnp.float32)
        sup_nu = jnp.take(state.nu, phys, axis=0).astype(jnp.float32)
        # ONE wide scatter-add builds all three new-row buffers, with the
        # prep contributor folding each old row in (see the packed branch)
        pr = prep[:, None]
        acc3 = jnp.zeros((Kp, 3 * row_width), jnp.float32).at[pinv].add(
            jnp.concatenate(
                [
                    acc_contrib(d_table) + sup * pr,
                    acc_contrib(d_mu) + sup_mu * pr,
                    acc_contrib(d_nu) + sup_nu * pr,
                ],
                axis=1,
            )
        )
        table, mu, nu = pallas_rows_write(
            (table, state.mu, state.nu), pids,
            (
                acc3[:, :row_width],
                acc3[:, row_width:2 * row_width].astype(mdt),
                acc3[:, 2 * row_width:].astype(mdt),
            ),
            n_real=n_real, chunk=min(chunk, Kp), interpret=interpret,
        )
    else:
        kw = dict(unique_indices=True)
        acc_mu, acc_nu = acc(d_mu, row_width), acc(d_nu, row_width)
        table = table.at[pids].add(acc(d_table, row_width), **kw)
        mu = state.mu.at[pids].add(acc_mu.astype(mdt), **kw)
        nu = state.nu.at[pids].add(acc_nu.astype(mdt), **kw)
    return table, SparseAdamState(mu=mu, nu=nu, count=count)
