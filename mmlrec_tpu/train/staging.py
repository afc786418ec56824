"""Dataset staging, per-batch metadata, and epoch execution for Trainer.fit.

Split out of train/trainer.py (VERDICT r4 #7 — no behavior change): this
module owns everything between "host arrays" and "jitted step dispatch":

* device staging of the combined dataset matrix (single-device or sharded
  P('data', None) over a mesh) and of per-epoch index/weight/metadata
  stacks;
* the two-phase per-batch duplicate/route metadata
  (train/sparse_embedding.py batch_step_metadata) plus the fit-time
  resolution of table_update / update_space and the stacked-container
  demotion;
* the full-shuffle epoch thread-ahead (``fs_host_prep`` — epoch e+1's
  permutation metadata is prepared and STAGED from a worker while epoch
  e's dispatches execute, bench_40m_fit_e2e.py round 4b);
* metadata upload compaction (round 5): the per-epoch metadata stack is
  ~1.5 MB/batch through a relay whose uploads serialize against
  dispatches — inv/pinv/accperm/resid_pos/resid_slot/gdup_* ride as
  uint16 and rep/prep as uint8 (~3x byte cut, exact while K <= 65536),
  decoded on device right after the per-step slice; dead arrays on the
  route paths upload as 1-wide dummies.
* the device-data epoch runners (block/slice mode and full-shuffle/gather
  mode, chained or scanned) and the streaming prefetch epoch loop.

Functions take the Trainer as their first argument; Trainer keeps thin
same-named methods so external callers (benchmarks, tests, multi_seed)
are unaffected.

Reference: the whole module replaces the reference's per-batch host
slicing + ``DataLoader`` feed (model/basemodel.py:242-331); the staged
layout and per-epoch device reorder have no reference counterpart.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# dataset staging
# ---------------------------------------------------------------------------


def stage_dataset(trainer, ids, dense, y, dmask):
    """Pack the dataset into ONE combined f32 matrix on device (ids are
    exact in f32 below 2^24); sharded P('data', None) under a mesh."""
    parts = [ids.astype(np.float32), dense, y]
    if dmask is not None:
        parts.append(dmask)
    combined = np.concatenate(parts, axis=1).astype(np.float32)
    trainer._stage_dims = (
        ids.shape[1],
        dense.shape[1],
        y.shape[1],
        dmask.shape[1] if dmask is not None else 0,
    )
    if trainer.mesh is not None:
        # mesh fast path: the dataset lives SHARDED over the 'data' axis
        # (each device holds N/n_data rows); batches are fetched with
        # parallel/mesh.py::distributed_take.  Pad rows to divide evenly
        # (pad rows are never indexed — every idx < n).
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = trainer.mesh.shape["data"]
        pad = (-len(combined)) % n_data
        if pad:
            combined = np.concatenate(
                [combined, np.zeros((pad, combined.shape[1]), np.float32)]
            )
        return jax.device_put(
            combined, NamedSharding(trainer.mesh, P("data", None))
        )
    return jnp.asarray(combined)


def to_mesh(trainer, a, spec=None):
    """Place a host array on the mesh (replicated by default); plain
    upload when no mesh."""
    if a is None:
        return None
    if trainer.mesh is None:
        return jnp.asarray(a)
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(
        np.asarray(a),
        NamedSharding(trainer.mesh, spec if spec is not None else P()),
    )


def fetch_staged_rows(trainer, staged, idx):
    """Batch fetch from the staged dataset: plain take single-device;
    explicit distributed gather (reduce-scatter routed) under a mesh."""
    if trainer.mesh is not None:
        from ..parallel.mesh import distributed_take

        return distributed_take(staged, idx, trainer.mesh)
    return jnp.take(staged, idx, axis=0)


def split_staged(trainer, rows, weight):
    S, Dd, T, Dm = trainer._stage_dims
    ids = rows[:, :S].astype(jnp.int32)
    dense = rows[:, S : S + Dd]
    y = rows[:, S + Dd : S + Dd + T]
    dmask = rows[:, S + Dd + T :] if Dm else None
    return (ids, dense, y, dmask, weight)


# ---------------------------------------------------------------------------
# table-update resolution + per-batch metadata
# ---------------------------------------------------------------------------


def emb_phys_rows_static(trainer) -> int:
    """Physical row count of the fused table (mirrors
    FusedEmbedding.setup), independent of table_update mode."""
    total = int(
        sum(s.feature.vocabulary_size for s in trainer.layout.sparse_slots)
    )
    rows = -(-max(total, 1) // 128) * 128
    P = getattr(trainer, "_emb_pack_factor", 1)
    if P > 1:
        rows = -(-rows // (P * 128)) * (P * 128)
    return rows // P


def resolve_table_update(trainer, batch_size: int) -> None:
    """Enforce the unique-metadata headroom constraint at fit time.

    batch_step_metadata needs n_phys_rows > Kp (the padded per-batch id
    count) to find distinct untouched pad rows.  Kp depends on the fit
    batch size, so the constructor cannot check it: auto-resolved
    pallas/unique quietly falls back to scatter here; an EXPLICIT mode
    raises with guidance instead of crashing inside the first batch.
    """
    if trainer.table_update == "scatter":
        return
    K = batch_size * len(trainer.layout.sparse_slots)
    Kp = -(-K // 256) * 256
    if trainer._emb_phys_rows > Kp:
        return
    mc = trainer.cfg.model_config
    stacked = getattr(trainer, "table_container", "split") == "stacked"
    if (
        stacked
        and mc.extra.get("_table_container_auto")
        and getattr(trainer, "_table_update_auto", False)
        and trainer.variables is None
        and getattr(trainer, "_train_state", None) is None
    ):
        # the config-time auto opt-in (resolve_table_container) assumed
        # the config's train_batch_size; this fit's batch breaks the
        # unique-metadata headroom.  No variables exist yet, so undo the
        # opt-in — the model reads table_container at init — and fall
        # through to the scatter demotion below.
        import warnings

        warnings.warn(
            f"table_container='stacked' was auto-engaged at the config "
            f"batch size but fit(batch_size={batch_size}) breaks the "
            f"unique-metadata headroom (physical rows "
            f"{trainer._emb_phys_rows} <= Kp={Kp}); demoting to the split "
            "layout and the scatter update"
        )
        mc.extra["table_container"] = "split"
        mc.extra.pop("_table_container_auto", None)
        trainer.table_container = "split"
        trainer.pair_gather = "split"
        trainer.dedup_route = "scatter"
    elif not getattr(trainer, "_table_update_auto", False) or stacked:
        # an initialized stacked container cannot demote to scatter
        # (the moments live inside the param), so it raises even under
        # auto; explicit table_update modes always raise
        raise ValueError(
            f"table_update={trainer.table_update!r}"
            + (" with table_container='stacked'" if stacked else "")
            + f" needs the physical table ({trainer._emb_phys_rows} rows) "
            f"to exceed the padded per-batch id count Kp={Kp}; use a "
            "larger vocabulary, a smaller batch, or "
            "table_update='scatter'"
        )
    trainer.table_update = "scatter"
    trainer._packed_moments = False
    trainer._step_fns.clear()
    prev = getattr(trainer, "_train_state", None)
    if prev and "table_opt" in prev:
        from .sparse_embedding import (
            SparseAdamPackedState,
            SparseAdamState,
            unpack_monu,
        )

        if isinstance(prev["table_opt"], SparseAdamPackedState):
            mu, nu = unpack_monu(prev["table_opt"].monu)
            prev["table_opt"] = SparseAdamState(
                mu=mu, nu=nu, count=prev["table_opt"].count
            )


def resolve_update_space(trainer, flat: np.ndarray) -> None:
    """Resolve update_space='auto' from the FIRST metadata batch's
    physical-row duplication (sticky for the trainer's lifetime so
    the jitted step program never flips mid-fit).  Crossover from the
    same-window 40M A/B: slot wins from ~25% duplication up
    (docs/perf_notes.md round 4)."""
    if trainer.update_space != "auto":
        return
    if (
        trainer.table_container != "stacked"
        or getattr(trainer, "dedup_route", "scatter") != "gather"
    ):
        trainer.update_space = "position"
        return
    P = trainer._emb_pack_factor
    K = flat.shape[1]
    dup = 1.0 - len(np.unique(flat[0] // P if P > 1 else flat[0])) / K
    trainer.update_space = "slot" if dup >= 0.25 else "position"


def step_metadata(trainer, flat: np.ndarray) -> tuple:
    """Per-batch host metadata stacks for flat [steps, K] logical ids:
    (inv, rep) under the default scatter update, plus
    (pids, pinv, nuniq) under unique/pallas — all from one sort
    (train/sparse_embedding.py batch_step_metadata)."""
    from .sparse_embedding import batch_step_metadata

    resolve_update_space(trainer, flat)
    if trainer.table_update == "scatter":
        return batch_step_metadata(flat)
    want_route = getattr(trainer, "dedup_route", "scatter") == "gather"
    meta = batch_step_metadata(
        flat, trainer._emb_pack_factor, trainer._emb_phys_rows,
        want_route=want_route,
        # monotone residual-capacity floor: keep the resid shapes (and
        # therefore the jitted step program) stable across epochs and
        # streaming batches — see batch_step_metadata's R_cap comment
        r_cap_min=getattr(trainer, "_route_r_cap", 0),
    )
    if want_route:
        # one shared floor for both residual widths (resid + gdup)
        trainer._route_r_cap = max(
            getattr(trainer, "_route_r_cap", 0), meta[7].shape[1],
            meta[9].shape[1],
        )
    return meta


# ---------------------------------------------------------------------------
# metadata upload compaction (round 5, VERDICT r4 #2)
# ---------------------------------------------------------------------------
#
# The full-shuffle epoch metadata stack is ~1.5 MB/batch; the relay
# serializes its device_put against dispatches unpredictably (observed
# 1.7-35 s epochs at 40M, perf_notes round 4b).  While K <= 65536 every
# position/slot index fits uint16 and the 0/1 rep masks fit uint8, so the
# stacks upload at ~1/2 / ~1/4 width and decode on device right after the
# per-step slice (two fused elementwise ops, free next to the step).
#
# Sentinel handling (exact, incl. the K == 65536 boundary): resid_slot's
# drop value Kp and gdup_tgt's drop value K may equal 65536, one past
# uint16.  They are stored as 65535 and remapped on device.  A REAL 65535
# can never be misrouted: a real resid_slot is < nuniq <= 65535 whenever
# any residual exists (all-unique batches have none), so remapping a real
# slot 65535 to Kp only ever touches a PAD slot the bounded write kernel
# never writes; a real gdup_tgt is a first occurrence with a later
# duplicate, so it is < K - 1 = 65535 by construction.
#
# Dead-array elision: under the gather dedup route the step consumes inv
# nowhere (the gdup route replaces the inv-scatter) and pinv only in
# position space with accperm absent / in slot mode — dead entries upload
# as [steps, 1] zero dummies.  Single-device paths only (the explicit
# mesh body slices inv/rep globally).


_U16_MAX = 65535


class MetaCodec:
    """Per-fit encoder/decoder for the metadata tuple.

    ``encode`` maps the host [steps, X] stacks to their upload form;
    ``decode`` maps one sliced device row back to the exact int32/f32
    arrays the step body expects.  Identity when compaction is off.
    """

    def __init__(self, kinds: Tuple[Tuple[str, int], ...]):
        # kinds[i] = (kind, sentinel_remap) with kind in
        # {"idx16", "mask8", "slot16", "raw", "dead"}
        self.kinds = kinds

    def encode(self, meta: tuple) -> tuple:
        out = []
        for (kind, sent), a in zip(self.kinds, meta):
            if kind == "idx16":
                out.append(a.astype(np.uint16))
            elif kind == "slot16":
                out.append(
                    np.where(a >= sent, _U16_MAX, a).astype(np.uint16))
            elif kind == "mask8":
                out.append(a.astype(np.uint8))
            elif kind == "dead":
                out.append(np.zeros((a.shape[0], 1), np.uint8))
            else:
                out.append(a)
        return tuple(out)

    def decode(self, sliced: tuple) -> tuple:
        out = []
        for (kind, sent), a in zip(self.kinds, sliced):
            if kind == "idx16":
                out.append(a.astype(jnp.int32))
            elif kind == "slot16":
                a = a.astype(jnp.int32)
                out.append(jnp.where(a == _U16_MAX, sent, a))
            elif kind == "mask8":
                out.append(a.astype(jnp.float32))
            elif kind == "dead":
                out.append(a.astype(jnp.int32))
            else:
                out.append(a)
        return tuple(out)


def meta_codec(trainer, meta: tuple) -> Optional[MetaCodec]:
    """Build the compaction codec for this fit's metadata tuple layout,
    or None when compaction cannot apply (K > 65536, mesh, or opted out
    via model_config.extra['meta_compact'] = False)."""
    mc = trainer.cfg.model_config
    if not mc.extra.get("meta_compact", True):
        return None
    if trainer.mesh is not None:
        return None  # explicit mesh body slices inv/rep globally
    K = meta[0].shape[1]  # inv width
    if K > _U16_MAX + 1:
        return None
    n = len(meta)
    route = n > 6
    slot_mode = getattr(trainer, "update_space", "position") == "slot"
    unique_update = trainer.table_update != "scatter"
    Kp = meta[2].shape[1] if unique_update else 0
    if unique_update and Kp > _U16_MAX + 1:
        return None
    kinds: List[Tuple[str, int]] = []
    # 0: inv [steps, K] — dead under the gather route (gdup replaces it)
    kinds.append(("dead", 0) if route else ("idx16", 0))
    # 1: rep [steps, K] f32 0/1
    kinds.append(("mask8", 0))
    if unique_update:
        # 2: pids [steps, Kp] — physical ROW ids, not compactable
        kinds.append(("raw", 0))
        # 3: pinv [steps, K] — dead in position mode when the route
        # supplies accperm; alive in slot mode (slot -> position take)
        kinds.append(
            ("idx16", 0) if (slot_mode or not route) else ("dead", 0))
        # 4: nuniq [steps, 1] int32
        kinds.append(("raw", 0))
        # 5: prep [steps, K] f32 0/1
        kinds.append(("mask8", 0))
        if route:
            kinds.append(("idx16", 0))        # 6: accperm [steps, Kp]
            kinds.append(("idx16", 0))        # 7: resid_pos
            kinds.append(("slot16", Kp))      # 8: resid_slot (Kp = drop)
            kinds.append(("idx16", 0))        # 9: gdup_pos
            kinds.append(("slot16", K))       # 10: gdup_tgt (K = drop)
    assert len(kinds) == n, (len(kinds), n)
    return MetaCodec(tuple(kinds))


def encode_meta(trainer, meta: tuple):
    """Attach/reuse the fit's codec and return the upload-form stacks.
    The codec is sticky per trainer (the jitted step specializes on the
    decoded dtypes, which are constant; the ENCODED layout must be too)."""
    codec = getattr(trainer, "_meta_codec", "unset")
    if codec == "unset":
        codec = meta_codec(trainer, meta)
        trainer._meta_codec = codec
    if codec is None:
        return meta
    return codec.encode(meta)


def slice_dedup(trainer, dedup2d, s):
    """Row s of the per-epoch metadata stacks, decoded to the step body's
    expected dtypes (two-phase mode; identity slice otherwise)."""
    if dedup2d is None:
        return ()
    sliced = tuple(
        jax.lax.dynamic_slice(a, (s, 0), (1, a.shape[1]))[0]
        for a in dedup2d
    )
    codec = getattr(trainer, "_meta_codec", None)
    if codec is None or codec == "unset":
        return sliced
    return codec.decode(sliced)


# ---------------------------------------------------------------------------
# fit staging plan (moved verbatim from Trainer.fit, VERDICT r4 #7)
# ---------------------------------------------------------------------------


def make_device_plan(trainer, ids, dense, y, dmask, batch_size, shuffle,
                     steps_per_epoch, n, rng_np, state, epochs,
                     initial_epoch, max_steps):
    """Decide the fit path and stage what it needs.

    Fast path: device-resident dataset + chained per-step dispatches (see
    the measurements above stage_dataset).  Under a mesh the dataset is
    STAGED SHARDED over the 'data' axis and batches are fetched with an
    explicit reduce-scatter-routed distributed gather (parallel/mesh.py::
    distributed_take), so mesh fits get the same scan_steps dispatch
    amortization as single-chip ones instead of per-batch relay uploads;
    requires batch_size divisible by the data axis (else the streaming
    path's per-batch shard_batch semantics apply).

    Returns (use_device_data, block_mode, staged, step_dev, block_w,
    block_dedup, fs_pool, ids, dense, y, dmask) — the data arrays come
    back possibly pre-shuffled (block mode permutes rows once so the
    fixed batch composition is random).
    """
    dataset_bytes = ids.nbytes + dense.nbytes + y.nbytes
    if trainer.mesh is None:
        use_device_data = dataset_bytes * 2 < trainer._device_data_bytes_cap
    else:
        n_data_axis = trainer.mesh.shape.get("data", 1)
        use_device_data = (
            batch_size % n_data_axis == 0
            # per-DEVICE staging bytes: rows are sharded n_data ways
            and dataset_bytes * 2
            < trainer._device_data_bytes_cap * n_data_axis
        )
    block_mode = shuffle == "block"
    staged = step_dev = block_w = block_dedup = None
    if use_device_data:
        state["epoch_step"] = jnp.zeros((), jnp.int32)
        if block_mode:
            # pre-shuffle rows once so fixed batch composition is random
            pre = rng_np.permutation(n)
            ids, dense, y = ids[pre], dense[pre], y[pre]
            dmask = dmask[pre] if dmask is not None else None
            pad_tail = (steps_per_epoch * batch_size) - n
            if pad_tail:
                rep = lambda a: np.concatenate(
                    [a, np.repeat(a[:1], pad_tail, 0)])
                staged = stage_dataset(
                    trainer, rep(ids), rep(dense), rep(y),
                    rep(dmask) if dmask is not None else None,
                )
            else:
                staged = stage_dataset(trainer, ids, dense, y, dmask)
            step_dev = trainer._make_slice_step(batch_size)
            block_w = np.ones((steps_per_epoch, batch_size), np.float32)
            if pad_tail:
                block_w[-1, batch_size - pad_tail :] = 0.0
            # staged ONCE per fit; per-epoch reorder is an on-device take
            # (run_block_epoch) — the old per-epoch re-upload was 16 MB at
            # the 4M-row flagship shape (round-5 e2e audit)
            trainer._block_w_dev = to_mesh(trainer, block_w)
            if trainer.two_phase_embedding and not getattr(
                    trainer, "device_metadata", False):
                # batch composition is FIXED in block mode, so per-batch
                # duplicate metadata is computed once per fit
                ids_p = rep(ids) if pad_tail else ids
                offs = np.asarray(trainer._fused_offsets)[None, :]
                flat = (ids_p.astype(np.int64) + offs).reshape(
                    steps_per_epoch, batch_size * ids.shape[1]
                )
                block_dedup = step_metadata(trainer, flat)
                # stage the per-batch metadata stacks ONCE: re-uploading
                # them each epoch (~1.5 MB/batch over the relay) was the
                # dominant e2e fit cost at production vocab — 15 s/epoch
                # against a 0.6 s device epoch (bench_40m_fit_e2e.py,
                # docs/perf_notes.md round 4b).  Per-epoch reordering
                # happens ON DEVICE with one [steps] index take;
                # uint16/uint8 compaction (above) cuts the staged bytes
                # ~3x, decoded after the per-step slice.
                block_dedup = encode_meta(trainer, block_dedup)
                block_dedup = tuple(
                    to_mesh(trainer, a) for a in block_dedup)
        else:
            staged = stage_dataset(trainer, ids, dense, y, dmask)
            step_dev = trainer._make_gather_step()

    # Full-shuffle two-phase epochs recompute the duplicate metadata for
    # the WHOLE epoch's batches at epoch start (~4 ms/batch host time,
    # train/sparse_embedding.py batch_step_metadata) while the device
    # sits idle.  Thread it one epoch AHEAD: epoch e+1's permutation is
    # drawn on the main thread (keeping the rng_np draw sequence
    # identical to the synchronous loop) and its numpy prep runs in a
    # single worker while epoch e's dispatches execute on device.
    fs_pool = None
    # A fit() aborted mid-epoch (e.g. the relay dying) exits through the
    # exception before the post-loop shutdown; clean up that previous
    # pool here so retry loops don't accumulate worker threads.
    if getattr(trainer, "_fs_pool", None) is not None:
        trainer._fs_pool.shutdown(wait=False, cancel_futures=True)
        trainer._fs_pool = None
    if (
        use_device_data
        and not block_mode
        and shuffle is True
        and trainer.two_phase_embedding
        and not max_steps
        and trainer._prefetch_batches > 0
        and (epochs - initial_epoch) > 1
    ):
        from concurrent.futures import ThreadPoolExecutor

        fs_pool = ThreadPoolExecutor(max_workers=1)
        trainer._fs_pool = fs_pool

    return (use_device_data, block_mode, staged, step_dev, block_w,
            block_dedup, fs_pool, ids, dense, y, dmask)


# ---------------------------------------------------------------------------
# eval tensor staging (moved verbatim from Trainer, VERDICT r4 #7)
# ---------------------------------------------------------------------------


def eval_batch_spec(trainer, batch_size: int):
    """PartitionSpec for a [steps, bs, ...] eval tensor under a mesh:
    per-batch rows sharded over 'data' (replicated if indivisible)."""
    from jax.sharding import PartitionSpec as P

    if (
        trainer.mesh is not None
        and batch_size % trainer.mesh.shape.get("data", 1) == 0
    ):
        return P(None, "data")
    return P()


def prepare_eval_tensors(trainer, ids, dense, dmask, batch_size: int):
    """Pad + reshape fixed eval arrays to [steps, bs, ...] device
    tensors once (repeated per-epoch uploads are wasted transfers).
    Under a mesh each batch's rows are sharded over 'data', so the
    scanned inference runs data-parallel and (with device_eval) only
    metric scalars ever cross the relay."""
    n = len(ids)
    steps = (n - 1) // batch_size + 1
    pad = steps * batch_size - n
    spec = eval_batch_spec(trainer, batch_size)

    def prep(a):
        if a is None:
            return None
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
        a = a.reshape(steps, batch_size, *a.shape[1:])
        if trainer.mesh is not None:
            return to_mesh(trainer, a, spec)
        return jnp.asarray(a)

    return (prep(ids), prep(dense), prep(dmask), n)


def prepare_metric_tensors(trainer, y, val_dev):
    """Stage padded labels + validity weights on device once for the
    fused predict+metrics program."""
    ids3, _, _, n = val_dev
    total = ids3.shape[0] * ids3.shape[1]
    y2 = np.asarray(y, np.float32)
    pad = total - len(y2)
    if pad:
        y2 = np.concatenate([y2, np.repeat(y2[-1:], pad, axis=0)])
    w = (np.arange(total) < n).astype(np.float32)
    return to_mesh(trainer, y2), to_mesh(trainer, w)


def prepare_mask_tensor(trainer, test_mask, total: int):
    """Pad the [N, D] domain test mask to the staged length (pad rows
    get all-zero masks, excluding them from every head)."""
    if test_mask is None:
        return None
    tm = np.asarray(test_mask, np.float32)
    pad = total - len(tm)
    if pad:
        tm = np.concatenate(
            [tm, np.zeros((pad,) + tm.shape[1:], np.float32)])
    return to_mesh(trainer, tm)


# ---------------------------------------------------------------------------
# epoch executors (moved verbatim from Trainer.fit, VERDICT r4 #7)
# ---------------------------------------------------------------------------


def drive_steps(trainer, kind, state, staged, arg, w2d_dev, dedup_dev,
                batch_size, steps_this_epoch, step_dev):
    """Run one epoch's train dispatches on the device-staged path: scanned
    chunks (scan_steps) or chained per-step dispatches.  Returns
    (state, loss_refs, prob_refs)."""
    loss_refs, prob_refs = [], []
    if trainer._scan_steps:
        pos = 0
        while pos < steps_this_epoch:
            L = (
                steps_this_epoch - pos
                if trainer._scan_steps < 0
                else min(trainer._scan_steps, steps_this_epoch - pos)
            )
            runner = trainer._make_scan_runner(kind, batch_size, L)
            state, tls, probs = runner(state, staged, arg, w2d_dev, dedup_dev)
            loss_refs.append(tls)
            if trainer.metric_fns:
                prob_refs.append(probs.reshape(-1, probs.shape[-1]))
            pos += L
    else:
        for _ in range(steps_this_epoch):
            state, total_loss, _, probs = step_dev(
                state, staged, arg, w2d_dev, dedup_dev
            )
            loss_refs.append(total_loss)
            if trainer.metric_fns:
                prob_refs.append(probs)
    return state, loss_refs, prob_refs


def run_block_epoch(trainer, state, staged, step_dev, block_w, block_dedup,
                    batch_size, steps_per_epoch, steps_this_epoch,
                    batch_order):
    """One epoch in block mode: batch COMPOSITION is fixed (rows were
    pre-shuffled once), only the batch order reshuffles; the staged
    metadata stacks reorder ON DEVICE with one [steps]-index take."""
    starts_dev = to_mesh(trainer, (batch_order * batch_size).astype(np.int32))
    order_dev = to_mesh(trainer, batch_order.astype(np.int32))
    # block_w is CONSTANT per fit — stage it once and reorder ON DEVICE
    # per epoch (round-5 flagship e2e audit: the per-epoch [steps, bs]
    # f32 re-upload was 16 MB/epoch through the relay at the 4M-row
    # flagship shape; same pattern as the metadata stacks below)
    w2d_dev = jnp.take(trainer._block_w_dev, order_dev, axis=0)
    dedup_dev = None
    if block_dedup is not None:
        dedup_dev = tuple(
            jnp.take(a, order_dev, axis=0) for a in block_dedup
        )
    state, loss_refs, prob_refs = drive_steps(
        trainer, "slice", state, staged, starts_dev, w2d_dev, dedup_dev,
        batch_size, steps_this_epoch, step_dev,
    )
    valid = block_w[batch_order].reshape(-1) > 0
    host_rows = (
        np.arange(steps_per_epoch * batch_size)
        .reshape(steps_per_epoch, batch_size)[batch_order]
        .reshape(-1)[valid]
    )
    take = int(valid.sum())
    spans = [(int(c), int(c)) for c in block_w[batch_order].sum(axis=1)]
    return state, loss_refs, prob_refs, valid, host_rows, take, spans


def run_gather_epoch(trainer, state, staged, step_dev, prep, batch_size,
                     steps_this_epoch):
    """One full-shuffle epoch over the staged dataset: per-step row
    gathers by the epoch's shuffled indices; metadata stacks were staged
    by fs_host_prep (possibly from the thread-ahead worker)."""
    idx_full, w_full, take, meta_np = prep
    idx2d_dev = to_mesh(
        trainer,
        idx_full.reshape(steps_this_epoch, batch_size).astype(np.int32),
    )
    if trainer.mesh is None:
        # the weight matrix is 1.0 below ``take`` and 0.0 at the padded
        # tail — build it ON DEVICE from the scalar instead of uploading
        # [steps, bs] f32 every epoch (16 MB at the 4M-row flagship
        # shape; round-5 e2e audit).  Bitwise-identical values.
        k = jnp.arange(steps_this_epoch * batch_size, dtype=jnp.int32)
        w2d_dev = (k < take).astype(jnp.float32).reshape(
            steps_this_epoch, batch_size)
    else:
        w2d_dev = to_mesh(
            trainer, w_full.reshape(steps_this_epoch, batch_size))
    state, loss_refs, prob_refs = drive_steps(
        trainer, "gather", state, staged, idx2d_dev, w2d_dev, meta_np,
        batch_size, steps_this_epoch, step_dev,
    )
    host_rows = idx_full[:take]
    spans = [
        (min(batch_size, take - s * batch_size),) * 2
        for s in range(steps_this_epoch)
    ]
    return state, loss_refs, prob_refs, None, host_rows, take, spans


def run_streaming_epoch(trainer, state, train_step, order, ids, dense, y,
                        dmask, batch_size, steps_this_epoch):
    """Streaming path (dataset too large to stage on device, or
    mesh-sharded batches).  Batch construction — host slicing, device
    uploads through the relay, and the two-phase duplicate metadata
    (~4 ms at K=65k) — runs in a single PREFETCH worker thread,
    overlapping the main thread's per-step dispatch + loss readback.
    One worker preserves batch order, so numerics are identical to the
    synchronous loop.  Returns (state, total_loss, examples, probs, ys,
    spans)."""

    def make_batch(s):
        idx = order[s * batch_size : (s + 1) * batch_size]
        pad = batch_size - len(idx)
        weight = np.ones(batch_size, np.float32)
        if pad:
            weight[len(idx) :] = 0.0
            idx = np.concatenate([idx, np.zeros(pad, np.int64)])
        batch = (
            jnp.asarray(ids[idx]),
            jnp.asarray(dense[idx]),
            jnp.asarray(y[idx]),
            jnp.asarray(dmask[idx]) if dmask is not None else None,
            jnp.asarray(weight),
        )
        if trainer.mesh is not None:
            from ..parallel.mesh import shard_batch

            batch = shard_batch(batch, trainer.mesh)
        if trainer.two_phase_embedding and not getattr(
                trainer, "device_metadata", False):
            offs = np.asarray(trainer._fused_offsets)[None, :]
            flat = (ids[idx].astype(np.int64) + offs).reshape(1, -1)
            meta = step_metadata(trainer, flat)
            batch = batch + tuple(jnp.asarray(a[0]) for a in meta)
        return idx, weight, batch

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    total_loss_epoch = 0.0
    examples = 0
    epoch_probs: List[np.ndarray] = []
    epoch_y: List[np.ndarray] = []
    spans: List[Tuple[int, int]] = []
    depth = max(int(trainer._prefetch_batches), 1)
    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = deque(
            pool.submit(make_batch, s)
            for s in range(min(depth, steps_this_epoch))
        )
        for s in range(steps_this_epoch):
            idx, weight, batch = pending.popleft().result()
            if s + depth < steps_this_epoch:
                pending.append(pool.submit(make_batch, s + depth))
            state, total_loss, _, probs = train_step(state, batch)
            examples += int(np.sum(weight))
            if trainer.metric_fns:
                epoch_probs.append(np.asarray(probs))
                epoch_y.append(y[idx])
                # pads sit at the batch tail (weight zeroed)
                spans.append((len(weight), int(weight.sum())))
            total_loss_epoch += float(total_loss)
    return state, total_loss_epoch, examples, epoch_probs, epoch_y, spans


def fs_host_prep(trainer, ids, n, batch_size, order_e, steps_e):
    """Full-shuffle epoch host prep: padded index/weight vectors plus the
    two-phase metadata stacks, STAGED on device from the calling thread
    (the worker, when threaded ahead) so the transfer rides during the
    previous epoch's dispatches (bench_40m_fit_e2e.py round 4b)."""
    padded_e = steps_e * batch_size
    idx_e = np.zeros(padded_e, np.int64)
    take_e = min(n, padded_e)
    idx_e[:take_e] = order_e[:take_e]
    w_e = np.zeros(padded_e, np.float32)
    w_e[:take_e] = 1.0
    meta_e = None
    if trainer.two_phase_embedding and not getattr(
            trainer, "device_metadata", False):
        offs = np.asarray(trainer._fused_offsets)[None, None, :]
        ids_e = ids[idx_e.reshape(steps_e, batch_size)]
        flat = (ids_e.astype(np.int64) + offs).reshape(steps_e, -1)
        meta_e = step_metadata(trainer, flat)
        # compaction (round 5): uint16/uint8 upload forms + dead-array
        # dummies cut the ~1.5 MB/batch stack ~3x before it hits the
        # relay; decoded on device after the per-step slice
        meta_e = encode_meta(trainer, meta_e)
        meta_e = tuple(to_mesh(trainer, a) for a in meta_e)
    return idx_e, w_e, take_e, meta_e
