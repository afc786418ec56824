"""Explicit collective embedding exchange (shard_map, hand-placed collectives).

The default meshed path leaves collective placement to GSPMD: the fused
table is row-sharded over the ``model`` axis and XLA partitions the
gather/scatter programs automatically (parallel/mesh.py).  This module is
the *explicit* formulation of the same exchange — SURVEY.md §7.6's
"all-to-all ID/grad exchange" spelled out as shard_map bodies — so that

* the collective schedule is pinned (one psum for the forward row fetch,
  one tiled all-gather for the row-gradient exchange, zero collectives for
  the owner-side scatter-adds), immune to GSPMD heuristic shifts;
* the per-device programs stay small and compile fast through the remote
  relay (GSPMD partitions of large-gather programs compiled pathologically
  slowly, docs/perf_notes.md);
* multi-chip behavior is testable on the virtual CPU mesh exactly as it
  will run over ICI.

Layout contract (matches parallel/mesh.py::variable_shardings):
  table/mu/nu  [R, C] row-sharded P('model', None) — R is the PHYSICAL row
  count (lane-packed tables keep their [rows/P, 128] layout; primitives
  take ``pack_factor`` and translate logical->physical internally);
  ids replicated along 'model', batch-sharded along 'data'.

The reference has no distributed embedding at all (one replicated
``nn.Embedding`` per feature, model/utils.py:466-488; its only parallelism
is ``torch.nn.DataParallel``, model/basemodel.py:235-238) — this subsystem
is the north-star addition, not a port.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..train.sparse_embedding import SparseAdamState

# ---------------------------------------------------------------------------
# Primitives — run INSIDE a shard_map body.  ``shard`` is this device's
# [R_local, C] slice of a row-sharded array; global physical row r lives on
# device r // R_local at local row r % R_local (contiguous row sharding,
# which is what P('model', None) on a [R, C] array means).
# ---------------------------------------------------------------------------


def owned_gather(
    shard: jnp.ndarray,
    flat_ids: jnp.ndarray,
    dim: int,
    pack_factor: int,
    axis_name: str = "model",
) -> jnp.ndarray:
    """[K] logical row ids (replicated along axis_name) -> [K, dim] rows.

    Each device serves the ids whose physical row it owns (zeros elsewhere);
    one psum over ``axis_name`` assembles the full answer.  This is the
    masked-partial + reduce formulation of the distributed lookup: with K
    rows of D floats the wire cost is one [K, D] reduction over ICI,
    independent of the table size.
    """
    P = pack_factor
    phys = flat_ids // P if P > 1 else flat_ids
    r_local = shard.shape[0]
    base = jax.lax.axis_index(axis_name) * r_local
    local = phys - base
    owned = (local >= 0) & (local < r_local)
    got = jnp.take(shard, jnp.clip(local, 0, r_local - 1), axis=0)
    got = jnp.where(owned[:, None], got, 0)
    if P > 1:
        sub = jax.nn.one_hot(flat_ids % P, P, dtype=shard.dtype)
        got = jnp.einsum("kp,kpd->kd", sub, got.reshape(-1, P, dim))
    return jax.lax.psum(got, axis_name)


def owned_scatter_add(
    shard: jnp.ndarray,
    flat_ids: jnp.ndarray,
    delta: jnp.ndarray,
    pack_factor: int,
    axis_name: str = "model",
) -> jnp.ndarray:
    """shard.at[owned logical rows] += delta, no collective.

    ``delta`` [K, dim] must already be identical on every device of
    ``axis_name`` (replicated), so each owner adds exactly its own rows;
    out-of-range (non-owned) indices drop.
    """
    P = pack_factor
    phys = flat_ids // P if P > 1 else flat_ids
    r_local = shard.shape[0]
    base = jax.lax.axis_index(axis_name) * r_local
    local = phys - base
    # non-owned rows -> r_local, dropped by mode="drop" (negative indices
    # would WRAP NumPy-style, not drop)
    local = jnp.where((local >= 0) & (local < r_local), local, r_local)
    if P > 1:
        dim = delta.shape[-1]
        sub = jax.nn.one_hot(flat_ids % P, P, dtype=delta.dtype)
        delta = jnp.einsum("kp,kd->kpd", sub, delta).reshape(-1, P * dim)
    return shard.at[local].add(delta, mode="drop")


def sharded_two_phase_sparse_adam(
    table_shard: jnp.ndarray,
    g_rows: jnp.ndarray,  # [K, D] global row cotangents, replicated on 'model'
    flat_ids: jnp.ndarray,  # [K] global logical ids, replicated
    inv: jnp.ndarray,
    rep: jnp.ndarray,
    state: SparseAdamState,  # mu/nu row-sharded like the table
    lr: float,
    pack_factor: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    axis_name: str = "model",
    g_sum: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, SparseAdamState]:
    """train/sparse_embedding.py::two_phase_sparse_adam on row-sharded
    table/moments: the moment row fetches are owned_gathers (one [K, D]
    psum each) and every update is an owner-local masked scatter-add.

    ``g_sum`` optionally supplies the duplicate-reduced row gradients
    (zeros_like(g_rows).at[inv].add(g_rows)) — the chunked-overlap exchange
    (parallel/explicit_step.py grad_exchange_chunks) accumulates it
    incrementally while later chunks are still on the wire."""
    dim = g_rows.shape[-1]
    count = state.count + 1
    t = count.astype(jnp.float32)
    mdt = state.mu.dtype
    if g_sum is None:
        g_sum = jnp.zeros_like(g_rows).at[inv].add(g_rows)
    mu_rows = owned_gather(state.mu, flat_ids, dim, pack_factor, axis_name)
    nu_rows = owned_gather(state.nu, flat_ids, dim, pack_factor, axis_name)
    mu_f = mu_rows.astype(jnp.float32)
    nu_f = nu_rows.astype(jnp.float32)
    new_mu = b1 * mu_f + (1.0 - b1) * g_sum
    new_nu = b2 * nu_f + (1.0 - b2) * g_sum * g_sum
    mu_hat = new_mu / (1.0 - b1**t)
    nu_hat = new_nu / (1.0 - b2**t)
    r = rep[:, None]
    table_shard = owned_scatter_add(
        table_shard, flat_ids,
        -lr * mu_hat / (jnp.sqrt(nu_hat) + eps) * r, pack_factor, axis_name,
    )
    mu = owned_scatter_add(
        state.mu, flat_ids,
        (new_mu.astype(mdt) - mu_rows.astype(mdt)) * r.astype(mdt),
        pack_factor, axis_name,
    )
    nu = owned_scatter_add(
        state.nu, flat_ids,
        (new_nu.astype(mdt) - nu_rows.astype(mdt)) * r.astype(mdt),
        pack_factor, axis_name,
    )
    return table_shard, SparseAdamState(mu=mu, nu=nu, count=count)


def sharded_two_phase_sparse_adam_folded(
    fat_shard: jnp.ndarray,  # [2*r_local, W] local [table_d; monu_d] slice
    g_rows: jnp.ndarray,  # [K, D] global row cotangents, replicated on 'model'
    flat_ids: jnp.ndarray,  # [K] global logical ids, replicated
    inv: jnp.ndarray,
    rep: jnp.ndarray,
    pids: jnp.ndarray,  # [Kp] unique physical rows (sorted prefix + tail pads)
    pinv: jnp.ndarray,  # [K] slot of each logical id's physical row
    nuniq: jnp.ndarray,  # [1] unique count
    prep: jnp.ndarray,  # [K] 1.0 at each physical row's first occurrence
    state,  # SparseAdamFoldedState (count only; moments live in the param)
    lr: float,
    pack_factor: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
    axis_name: str = "model",
    g_sum: jnp.ndarray = None,
    accperm=None,
    resid_pos=None,
    resid_slot=None,
    gdup_pos=None,
    gdup_tgt=None,
    update_space: str = "position",
    chunk: int = 256,
):
    """The STACKED-container table update on the row-sharded mesh (round 5,
    VERDICT r4 #1) — the full single-chip round-4 recipe, shard-local:

    * the fat param uses the SHARD-MAJOR layout
      (train/sparse_embedding.py split_stacked_planes): this shard's
      [2r, W] slice is [table_d; monu_d], so ``reshape(2, r, W)`` is its
      own local stacked container and BOTH planes of every owned physical
      row are local — zero collectives in the entire update;
    * phase-1 old rows ride the dual pair-gather kernel
      (ops/pallas_gather.py — ONE [2, 1, 128] strided DMA per row-pair,
      clipped local ids; non-owned rows are masked to zero and only feed
      slots outside this shard's bounds window);
    * wide-lane Adam math + per-plane int32 gather-route dedup exactly as
      single-chip (train/sparse_embedding.py two_phase_sparse_adam_unique
      folded branch);
    * ``update_space='slot'`` runs the slot-granularity variant
      (two_phase_sparse_adam_slot): pair-gather by pids, ONE-plane
      gradient route, slot-space wide-lane math;
    * the write streams this shard's contiguous owned window of the
      sorted unique row list through pallas_rows_write_dual's bounds mode.

    Owned written rows are BITWISE equal to the single-chip stacked path
    (pinned by tests/test_mesh_stacked.py): per owned lane the identical
    scalar chain runs on identical inputs, and every contributor of an
    in-window slot is owned by this shard (contributors of a slot share
    its physical row).  Reference: the reference's only parallelism is
    ``torch.nn.DataParallel`` (model/basemodel.py:235-238).
    """
    from ..ops.pallas_gather import pallas_rows_gather_dual
    from ..ops.pallas_scatter import pallas_rows_write_dual
    from ..train.sparse_embedding import (
        SparseAdamFoldedState,
        pack_monu_rounded,
        unpack_monu_f32,
    )

    dim = g_rows.shape[-1]
    K = g_rows.shape[0]
    P = pack_factor
    W = fat_shard.shape[1]
    assert fat_shard.shape[0] % 2 == 0, fat_shard.shape
    r_local = fat_shard.shape[0] // 2
    base = jax.lax.axis_index(axis_name) * r_local
    Kp = pids.shape[0]
    count = state.count + 1
    t = count.astype(jnp.float32)
    stacked_local = fat_shard.reshape(2, r_local, W)
    phys = flat_ids // P if P > 1 else flat_ids
    bounds = _owned_bounds(pids, nuniq, base, r_local)
    local_pids = (pids - base).astype(jnp.int32)

    if g_sum is None:
        if gdup_pos is not None:
            g_sum = g_rows.at[gdup_tgt].add(g_rows[gdup_pos], mode="drop")
        else:
            g_sum = jnp.zeros_like(g_rows).at[inv].add(g_rows)

    if update_space == "slot":
        # ---- SLOT-SPACE branch (single-chip two_phase_sparse_adam_slot,
        # shard-local): pair-gather the n_phys_unique slot rows (clipped
        # local ids — non-owned slots fetch garbage that only lands
        # outside the bounds window), route ONE masked-gradient plane +
        # the lane-ownership plane, run the wide-lane chain at slot
        # granularity, write the owned window.
        assert accperm is not None, "slot space needs the gather route"
        # bounds-windowed pair-gather: only this shard's contiguous owned
        # slot window issues DMAs ((n-1)/n skipped); out-window slots are
        # poisoned/uninitialized and only feed values the bounded write
        # drops
        pair = pallas_rows_gather_dual(
            stacked_local,
            jnp.clip(local_pids, 0, r_local - 1),
            bounds=bounds,
            chunk=min(chunk, Kp),
            interpret=interpret,
        )
        sup_slot, monu_slot = pair[0], pair[1]
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
        gwi = jax.lax.bitcast_convert_type(gw, jnp.int32)
        g_slot = jax.lax.bitcast_convert_type(
            gwi[accperm].at[resid_slot].add(gwi[resid_pos], mode="drop"),
            jnp.float32,
        )  # [Kp, W]
        ow_slot = ow[accperm].at[resid_slot].add(ow[resid_pos], mode="drop")
        touched = jnp.broadcast_to(
            (ow_slot > 0)[:, :, None],
            (Kp, ow_slot.shape[1], W // ow_slot.shape[1]),
        ).reshape(Kp, W)
        mu_w, nu_w = unpack_monu_f32(monu_slot)
        new_mu_w = b1 * mu_w + (1.0 - b1) * g_slot
        new_nu_w = b2 * nu_w + (1.0 - b2) * g_slot * g_slot
        mu_hat_w = new_mu_w / (1.0 - b1**t)
        nu_hat_w = new_nu_w / (1.0 - b2**t)
        d_w = -lr * mu_hat_w / (jnp.sqrt(nu_hat_w) + eps)
        new_t = jnp.where(touched, sup_slot + d_w, sup_slot)
        new_monu = jnp.where(
            touched, pack_monu_rounded(new_mu_w, new_nu_w), monu_slot)
        new_stacked = pallas_rows_write_dual(
            stacked_local, local_pids, jnp.stack([new_t, new_monu]),
            bounds=bounds, chunk=min(chunk, Kp), interpret=interpret,
        )
        return (
            new_stacked.reshape(fat_shard.shape),
            SparseAdamFoldedState(count=count),
        )

    # ---- POSITION-SPACE branch (single-chip folded branch of
    # two_phase_sparse_adam_unique, shard-local)
    local = phys - base
    owned = (local >= 0) & (local < r_local)
    pair = pallas_rows_gather_dual(
        stacked_local,
        jnp.clip(local, 0, r_local - 1).astype(jnp.int32),
        chunk=min(chunk, K),
        interpret=interpret,
    )  # [2, K, W] — ONE strided DMA per pair, as single-chip pair_gather
    sup = jnp.where(owned[:, None], pair[0], 0)
    sup_c = jnp.where(owned[:, None], pair[1], 0)
    r = rep[:, None]
    own_mask = (
        ((jnp.arange(P * dim, dtype=jnp.int32) // dim)[None, :]
         == (flat_ids % P).astype(jnp.int32)[:, None])
        if P > 1 else None
    )

    def _tile(x):
        return jnp.broadcast_to(
            x[:, None, :], (K, P, x.shape[-1])).reshape(K, P * x.shape[-1])

    def own_sel(x):
        return jnp.where(own_mask, x, 0.0) if P > 1 else x

    mu_w, nu_w = unpack_monu_f32(sup_c)
    g_w = own_sel(_tile(g_sum)) if P > 1 else g_sum
    new_mu_w = b1 * mu_w + (1.0 - b1) * g_w
    new_nu_w = b2 * nu_w + (1.0 - b2) * g_w * g_w
    mu_hat_w = new_mu_w / (1.0 - b1**t)
    nu_hat_w = new_nu_w / (1.0 - b2**t)
    d_table_w = -lr * mu_hat_w / (jnp.sqrt(nu_hat_w) + eps) * r
    vals_c = pack_monu_rounded(new_mu_w, new_nu_w)
    r_w = jnp.broadcast_to(r, (K, W))
    own = jnp.where(own_mask, r_w, 0.0) if P > 1 else r_w
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
    if accperm is not None:
        def plane(c):
            return c[accperm].at[resid_slot].add(c[resid_pos], mode="drop")

        accd = jnp.stack([plane(contrib_t_i), plane(contrib_monu_i)])
    else:
        accd = jnp.zeros((2, Kp, W), jnp.int32).at[:, pinv].add(
            jnp.stack([contrib_t_i, contrib_monu_i])
        )
    new_stacked = pallas_rows_write_dual(
        stacked_local, local_pids,
        jax.lax.bitcast_convert_type(accd, jnp.float32),
        bounds=bounds, chunk=min(chunk, Kp), interpret=interpret,
    )
    return (
        new_stacked.reshape(fat_shard.shape),
        SparseAdamFoldedState(count=count),
    )


def _owned_bounds(pids, nuniq, base, r_local):
    """Contiguous slot window [lo, hi) of this shard's rows within the
    sorted unique physical row list (slots >= nuniq are tail pads)."""
    Kp = pids.shape[0]
    owned = (
        (pids >= base)
        & (pids < base + r_local)
        & (jnp.arange(Kp, dtype=jnp.int32) < nuniq[0])
    )
    lo = jnp.argmax(owned).astype(jnp.int32)  # 0 when none owned
    cnt = jnp.sum(owned).astype(jnp.int32)
    return jnp.stack([lo, lo + cnt])


def sharded_two_phase_sparse_adam_pallas(
    table_shard: jnp.ndarray,
    g_rows: jnp.ndarray,  # [K, D] global row cotangents, replicated on 'model'
    flat_ids: jnp.ndarray,  # [K] global logical ids, replicated
    inv: jnp.ndarray,
    rep: jnp.ndarray,
    pids: jnp.ndarray,  # [Kp] unique physical rows (sorted prefix + tail pads)
    pinv: jnp.ndarray,  # [K] slot of each logical id's physical row
    nuniq: jnp.ndarray,  # [1] unique count
    prep: jnp.ndarray,  # [K] 1.0 at each physical row's first occurrence
    state,  # SparseAdamState or SparseAdamPackedState, row-sharded
    lr: float,
    pack_factor: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
    axis_name: str = "model",
    g_sum: jnp.ndarray = None,
    accperm=None,  # [Kp] gather-route dedup (batch_step_metadata want_route)
    resid_pos=None,  # [R_cap] residual contributor positions
    resid_slot=None,  # [R_cap] residual target slots (Kp = drop)
    gdup_pos=None,  # [G_cap] logical-dup gradient residual positions
    gdup_tgt=None,  # [G_cap] their first-occurrence targets (K = drop)
):
    """The write-only-kernel table update on row-sharded state.

    Each device computes the REPLICATED new-row buffers (same math as the
    single-device two_phase_sparse_adam_unique pallas path — the value
    buffers are [Kp, W] and cheap next to the exchange), finds its
    contiguous owned window of the sorted unique row list, and streams its
    rows with ONE write DMA each (ops/pallas_scatter.py bounds mode).  The
    old-row fetches are LOCAL takes — every physical row a shard writes is
    locally resident, so non-owned positions may hold zeros (they only
    flow into slots outside the written window).  ZERO collectives in the
    entire update.

    The packed (bf16 pair container) branch mirrors the round-4
    single-chip recipe: wide-lane Adam math (no einsum selections or
    narrow->widen broadcasts) and, when the gather-route metadata is
    supplied, the per-plane designated-contributor gather + residual
    scatter instead of the full [Kp, 2W] accumulation scatter (VERDICT r3
    #2 — the scatter shape measured 20.1-52.6 ns/row vs 8.8 for gathers).
    Correctness under sharding: a shard's contribs are garbage at
    positions whose rows it does not own, but every contributor of a slot
    inside this shard's bounds window shares that slot's physical row —
    so owned slots accumulate exactly the owned (correct) contribs, and
    garbage lands only on slots outside the written window.
    """
    from ..train.sparse_embedding import (
        SparseAdamPackedState,
        pack_monu_rounded,
        unpack_monu_f32,
    )
    from ..ops.pallas_scatter import pallas_rows_write

    dim = g_rows.shape[-1]
    K = g_rows.shape[0]
    P = pack_factor
    packed = isinstance(state, SparseAdamPackedState)
    count = state.count + 1
    t = count.astype(jnp.float32)
    phys = flat_ids // P if P > 1 else flat_ids
    r_local = table_shard.shape[0]
    base = jax.lax.axis_index(axis_name) * r_local
    W = table_shard.shape[1]
    Kp = pids.shape[0]

    if g_sum is None:
        if gdup_pos is not None:
            # routed gradient dedup (see train/sparse_embedding.py): only
            # the logical duplicates scatter; non-first positions hold
            # g[j] garbage masked by rep/own downstream
            g_sum = g_rows.at[gdup_tgt].add(g_rows[gdup_pos], mode="drop")
        else:
            g_sum = jnp.zeros_like(g_rows).at[inv].add(g_rows)

    def local_rows(shard, ids_phys):
        """Old rows WITHOUT a collective: every physical row a shard
        writes is locally resident (a slot's logical contributors share
        its physical row), so non-owned positions may hold zeros — they
        only flow into slots outside this shard's written window."""
        local = ids_phys - base
        owned = (local >= 0) & (local < r_local)
        got = jnp.take(shard, jnp.clip(local, 0, r_local - 1), axis=0)
        return jnp.where(owned[:, None], got, 0)

    sup = local_rows(table_shard, phys)  # [K, W] old table rows (owned)
    r = rep[:, None]
    pr = prep[:, None]
    bounds = _owned_bounds(pids, nuniq, base, r_local)
    local_pids = (pids - base).astype(jnp.int32)
    own_mask = (
        ((jnp.arange(P * dim, dtype=jnp.int32) // dim)[None, :]
         == (flat_ids % P).astype(jnp.int32)[:, None])
        if P > 1 else None
    )  # [K, W] bool: lane belongs to this logical id's sub-row

    def _tile(x):
        return jnp.broadcast_to(
            x[:, None, :], (K, P, x.shape[-1])).reshape(K, P * x.shape[-1])

    def own_sel(x):
        """Zero a wide [K, W] buffer's non-owned lanes."""
        return jnp.where(own_mask, x, 0.0) if P > 1 else x

    if packed:
        sup_c = local_rows(state.monu, phys)
        # wide-lane math — identical per-owned-lane op chain to the narrow
        # form (see train/sparse_embedding.py round-4 note); non-owned /
        # non-resident lanes compute garbage masked by own or the bounds
        # window
        mu_w, nu_w = unpack_monu_f32(sup_c)  # f32 [K, W]
        g_w = own_sel(_tile(g_sum)) if P > 1 else g_sum
        new_mu_w = b1 * mu_w + (1.0 - b1) * g_w
        new_nu_w = b2 * nu_w + (1.0 - b2) * g_w * g_w
        mu_hat_w = new_mu_w / (1.0 - b1**t)
        nu_hat_w = new_nu_w / (1.0 - b2**t)
        d_table_w = -lr * mu_hat_w / (jnp.sqrt(nu_hat_w) + eps) * r
        vals_c = pack_monu_rounded(new_mu_w, new_nu_w)  # [K, W] f32
        r_w = jnp.broadcast_to(r, (K, W))
        own = jnp.where(own_mask, r_w, 0.0) if P > 1 else r_w
        # Old-row fold with NO [Kp, W] monu base gather (see the
        # single-device path, train/sparse_embedding.py): owned lanes ride
        # as wrapping int32 deltas (new_bits - old_bits) against the
        # already-gathered sup_c and the prep contributor adds the whole
        # old row, so per lane the sum is exactly new (owned) or old.
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
        if accperm is not None:
            # per-plane gather-route dedup (bitwise equal — int32 payload
            # adds commute; perf_notes "Per-plane gather route")
            def plane(c):
                return jax.lax.bitcast_convert_type(
                    c[accperm].at[resid_slot].add(c[resid_pos], mode="drop"),
                    jnp.float32,
                )

            acc_t = plane(contrib_t_i)
            acc_monu = plane(contrib_monu_i)
        else:
            acc2 = jnp.zeros((Kp, 2 * W), jnp.int32).at[pinv].add(
                jnp.concatenate([contrib_t_i, contrib_monu_i], axis=1)
            )
            acc_t = jax.lax.bitcast_convert_type(acc2[:, :W], jnp.float32)
            acc_monu = jax.lax.bitcast_convert_type(acc2[:, W:], jnp.float32)
        new_table, new_monu = pallas_rows_write(
            (table_shard, state.monu), local_pids,
            (acc_t, acc_monu),
            bounds=bounds, chunk=min(256, Kp), interpret=interpret,
        )
        return new_table, SparseAdamPackedState(monu=new_monu, count=count)

    # ---- non-packed (split f32/bf16 moments): narrow math + einsum widen
    sub = jax.nn.one_hot(flat_ids % P, P, dtype=jnp.float32) if P > 1 else None

    def extract(sup_rows):
        if P > 1:
            return jnp.einsum(
                "kp,kpd->kd", sub,
                sup_rows.astype(jnp.float32).reshape(K, P, dim))
        return sup_rows.astype(jnp.float32)

    def widen(x):
        if P > 1:
            return jnp.einsum("kp,kd->kpd", sub, x).reshape(K, P * dim)
        return x

    sup_mu = local_rows(state.mu, phys)
    sup_nu = local_rows(state.nu, phys)
    mu_f, nu_f = extract(sup_mu), extract(sup_nu)
    new_mu = b1 * mu_f + (1.0 - b1) * g_sum
    new_nu = b2 * nu_f + (1.0 - b2) * g_sum * g_sum
    mu_hat = new_mu / (1.0 - b1**t)
    nu_hat = new_nu / (1.0 - b2**t)
    d_table = -lr * mu_hat / (jnp.sqrt(nu_hat) + eps) * r
    mdt = state.mu.dtype
    d_mu = (new_mu.astype(mdt).astype(jnp.float32) - mu_f) * r
    d_nu = (new_nu.astype(mdt).astype(jnp.float32) - nu_f) * r
    acc3 = jnp.zeros((Kp, 3 * W), jnp.float32).at[pinv].add(
        jnp.concatenate(
            [
                widen(d_table) + sup * pr,
                widen(d_mu) + sup_mu.astype(jnp.float32) * pr,
                widen(d_nu) + sup_nu.astype(jnp.float32) * pr,
            ],
            axis=1,
        )
    )
    new_table, new_mu_s, new_nu_s = pallas_rows_write(
        (table_shard, state.mu, state.nu), local_pids,
        (acc3[:, :W], acc3[:, W:2 * W].astype(mdt),
         acc3[:, 2 * W:].astype(mdt)),
        bounds=bounds, chunk=min(256, Kp), interpret=interpret,
    )
    return new_table, SparseAdamState(mu=new_mu_s, nu=new_nu_s, count=count)
