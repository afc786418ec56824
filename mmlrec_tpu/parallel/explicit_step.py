"""Explicit-collective two-phase train step (shard_map over (data, model)).

Builds a drop-in replacement for Trainer._step_body_two_phase in which every
cross-device exchange is hand-placed instead of left to GSPMD
(parallel/shard_embedding.py has the rationale).  Per step, the collective
schedule is exactly:

  1. ``owned_gather``: one [K_local, D] psum over 'model' — the distributed
     row fetch for this data shard's ids;
  2. one psum of the dense-parameter gradients over 'data' (the classic DP
     gradient all-reduce);
  3. one tiled all-gather of (flat_ids, row-cotangents) over 'data' — the
     ID/gradient exchange that routes every touched row's gradient to its
     owner shard;
  4. owner-local SparseAdam table/moment updates — zero collectives.  On
     the pallas+packed path the unique-slot accumulation rides the same
     per-plane designated-contributor gather + residual route as the
     single-chip recipe (round 4; scatter shapes measured 20.1-52.6
     ns/row vs 8.8 for gathers) and each shard streams its contiguous
     owned window of the sorted unique row list through the write-only
     row kernel.

Numerics match the single-device two-phase step exactly (modulo f32
reduction order); pinned by tests/test_sharding.py.

batch_stats models (dnn_use_bn / STAR's DomainBatchNorm —
configs_mtl/config_census.json:38, configs_msl/config_amazon.json:38)
are supported since round 4: BN layers psum their batch moments over
'data' (ops/layers.py bn_cross_replica_axis) so the statistics equal the
global batch's.  Dropout is supported since round 5 (VERDICT r4 #6):
masks are drawn for the GLOBAL batch and row-sliced per shard
(ops/layers.py dropout_global_batch), so per-shard streams are
bit-identical to the single-device program's.

Reference: the rebuilt exchange has no counterpart — the reference's only
parallelism is ``torch.nn.DataParallel`` (model/basemodel.py:235-238).

Enable with ``model_config.explicit_collective_embedding: true`` together
with ``two_phase_embedding: true`` and a (data, model) mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..ops.layers import bn_cross_replica_axis, dropout_global_batch
from ..train.sparse_embedding import (
    SparseAdamFoldedState,
    SparseAdamPackedState,
    SparseAdamState,
)
from .shard_embedding import (
    owned_gather,
    sharded_two_phase_sparse_adam,
    sharded_two_phase_sparse_adam_folded,
    sharded_two_phase_sparse_adam_pallas,
)


def make_explicit_two_phase_step(trainer):
    """-> UNJITTED step(state, batch) with the Trainer's standard
    signatures.  Trainer._step_body dispatches here, so the same body rides
    the streaming per-batch jit AND the device-staged scan runners
    (shard_map composes under jit/lax.scan)."""
    mesh = trainer.mesh
    if mesh is None or "data" not in mesh.shape or "model" not in mesh.shape:
        raise ValueError("explicit_collective_embedding needs a (data, model) mesh")
    n_data = mesh.shape["data"]
    dim = trainer._emb_dim
    pack_factor = trainer._emb_pack_factor
    lr = trainer.cfg.optim_config.lr
    offsets = trainer._fused_offsets

    use_pallas = trainer.table_update == "pallas"
    # round 5: in-step dedup metadata (train/sparse_embedding.py
    # device_step_metadata) — computed REPLICATED from the all-gathered
    # global id list, so mesh fits carry zero metadata uploads.  Pairs
    # with dedup_route='scatter'/position space (trainer validation).
    device_meta = getattr(trainer, "device_metadata", False)
    # round 5: the stacked table+moment container on the mesh — the fat
    # param's shard-major [2r, W] slices keep each owned row's pair local
    # (sharded_two_phase_sparse_adam_folded); the forward fetch gathers
    # from the local table plane (shard[:r]).
    folded = getattr(trainer, "table_container", "split") == "stacked"
    update_space = getattr(trainer, "update_space", "position")
    pallas_interpret = getattr(trainer, "_pallas_interpret", True)
    # grad_exchange_chunks > 1 pipelines the ID/grad exchange: the row
    # cotangents are all-gathered in C tiles and the duplicate-reduction
    # scatter for tile c runs while tile c+1 is still on the wire.  XLA's
    # async collectives can then overlap wire time with both that scatter
    # chain and the independent dense-parameter update.  See
    # docs/scaling_model.md for when this matters (wire-bound regime).
    exchange_chunks = int(
        trainer.cfg.model_config.extra.get("grad_exchange_chunks", 1) or 1
    )

    def body(rest, table, topt, opt_state, rng, bstats, ids, dense, y, dmask,
             weight, inv, rep, *meta):
        B_loc, F = ids.shape
        k_loc = B_loc * F
        shard_i = jax.lax.axis_index("data")
        flat_local = (ids + offsets[None, :]).reshape(-1)
        # folded: the local slice is [table_d; monu_d] — the forward fetch
        # reads the table plane only (base/r_local math is unchanged since
        # owned_gather keys on the plane's row count)
        fwd_table = table[: table.shape[0] // 2] if folded else table
        rows = owned_gather(fwd_table, flat_local, dim, pack_factor)  # psum 'model'
        rng, step_rng = jax.random.split(rng)
        if device_meta:
            # in-step metadata from the GLOBAL id list (every shard
            # computes the identical replicated values); the tiled
            # all-gather reassembles the global batch order so the
            # single-chip semantics carry over verbatim
            from ..train.sparse_embedding import device_step_metadata

            k_glob_ = k_loc * n_data
            flat_glob = jax.lax.all_gather(flat_local, "data", tiled=True)
            Kp_n = -(-k_glob_ // 256) * 256
            inv, rep, d_pids, d_pinv, d_nuniq, d_prep = device_step_metadata(
                flat_glob.astype(jnp.int32), pack_factor, Kp_n,
                trainer._emb_phys_rows,
            )
            meta = (d_pids, d_pinv, d_nuniq, d_prep) if use_pallas else ()
        # rep slice for this data shard: partitions the touched-rows L2 term
        rep_local = jax.lax.dynamic_slice_in_dim(rep, shard_i * k_loc, k_loc)
        inv_local = jax.lax.dynamic_slice_in_dim(inv, shard_i * k_loc, k_loc)
        local_batch = (ids, dense, y, dmask, weight, inv_local, rep_local)

        def local_obj(rest_, rows_):
            # batch-stats models: BN layers psum their batch moments over
            # 'data' (ops/layers.py bn_cross_replica_axis) so statistics
            # equal the global batch's and the mutated running stats are
            # replicated across both mesh axes.  Dropout (round 5, VERDICT
            # r4 #6): masks draw for the GLOBAL batch and row-slice per
            # shard (ops/layers.py dropout_global_batch) so per-shard
            # streams equal the single-device program's.
            with bn_cross_replica_axis("data" if bstats else None), \
                    dropout_global_batch("data", n_data):
                return trainer._loss_terms_injected(
                    rest_, table, rows_.reshape(B_loc, F, dim), bstats,
                    local_batch, step_rng, reg_scale=1.0 / n_data,
                )

        (total_loss, (data_loss, new_stats, probs)), (g_rest, g_rows) = (
            jax.value_and_grad(local_obj, argnums=(0, 1), has_aux=True)(
                rest, rows.reshape(B_loc * F, dim)
            )
        )
        total_loss = jax.lax.psum(total_loss, "data")
        data_loss = jax.lax.psum(data_loss, "data")
        g_rest = jax.lax.psum(g_rest, "data")  # DP gradient all-reduce

        # ID/grad exchange: route every data shard's row cotangents to the
        # vocab owners.  tiled all-gather reassembles the global batch order
        # (shard_batch splits rows contiguously), so the host-precomputed
        # global (inv, rep) dedup metadata applies verbatim.  The id gather
        # has no dependency on the backward pass, so XLA can launch it
        # alongside fwd+bwd.
        flat_all = jax.lax.all_gather(flat_local, "data", tiled=True)
        k_glob = k_loc * n_data
        if exchange_chunks > 1 and k_loc % exchange_chunks != 0:
            import warnings

            warnings.warn(
                f"grad_exchange_chunks={exchange_chunks} ignored: the local "
                f"row count k_loc={k_loc} (batch/shard x n_sparse) is not "
                f"divisible by it — falling back to the single all-gather. "
                f"Pick a divisor of {k_loc}.",
                stacklevel=2,
            )
        if exchange_chunks > 1 and k_loc % exchange_chunks == 0:
            # Pipelined exchange: C tiled all-gathers of [k_loc/C, D] each;
            # tile c's duplicate-reduction scatter overlaps tile c+1's wire
            # time.  A gathered tile's position (s, j) is global row
            # s*k_loc + c*L + j (shard-major batch split), so the global
            # host-precomputed inv applies through that index map.  The
            # full [K, D] g_rows_all never materializes.
            L = k_loc // exchange_chunks
            g_sum = jnp.zeros((k_glob, dim), g_rows.dtype)
            shard_pos = (jnp.arange(n_data, dtype=jnp.int32) * k_loc)[:, None]
            for c in range(exchange_chunks):
                gc = jax.lax.dynamic_slice_in_dim(g_rows, c * L, L)
                gc_all = jax.lax.all_gather(gc, "data", tiled=True)
                pos = (shard_pos + c * L
                       + jnp.arange(L, dtype=jnp.int32)[None, :]).reshape(-1)
                g_sum = g_sum.at[jnp.take(inv, pos)].add(gc_all)
            g_rows_all = g_sum  # duplicate-reduced; passed as g_sum below
        else:
            g_rows_all = jax.lax.all_gather(g_rows, "data", tiled=True)
            g_sum = None
        if use_pallas:
            pids, pinv, nuniq, prep = meta[:4]
            # gather-route dedup metadata rides behind the unique-row
            # metadata when dedup_route == "gather" (trainer._step_metadata
            # want_route)
            route = (
                dict(accperm=meta[4], resid_pos=meta[5], resid_slot=meta[6],
                     gdup_pos=meta[7], gdup_tgt=meta[8])
                if len(meta) > 4 else {}
            )
            if folded:
                new_table, new_topt = sharded_two_phase_sparse_adam_folded(
                    table, g_rows_all, flat_all, inv, rep, pids, pinv,
                    nuniq, prep, topt, lr=lr, pack_factor=pack_factor,
                    interpret=pallas_interpret, g_sum=g_sum,
                    update_space=update_space, **route,
                )
            else:
                new_table, new_topt = sharded_two_phase_sparse_adam_pallas(
                    table, g_rows_all, flat_all, inv, rep, pids, pinv,
                    nuniq, prep, topt, lr=lr, pack_factor=pack_factor,
                    interpret=pallas_interpret, g_sum=g_sum, **route,
                )
        else:
            new_table, new_topt = sharded_two_phase_sparse_adam(
                table, g_rows_all, flat_all, inv, rep, topt,
                lr=lr, pack_factor=pack_factor, g_sum=g_sum,
            )
        updates, opt_state = trainer.tx.update(g_rest, opt_state, rest)
        rest = optax.apply_updates(rest, updates)
        return (rest, new_table, new_topt, opt_state, rng, new_stats,
                total_loss, data_loss, probs)

    row_sharded = P("model", None)

    def step(state, batch):
        ids, dense, y, dmask, weight = batch[:5]
        if device_meta:
            # metadata computed in-body; replicated dummies keep the
            # shard_map signature uniform
            inv = jnp.zeros((1,), jnp.int32)
            rep = jnp.zeros((1,), jnp.float32)
            meta = ()
        else:
            inv, rep = batch[5], batch[6]
            meta = tuple(batch[7:])  # (pids, pinv, nuniq, prep[, route])
        topt = state["table_opt"]
        if isinstance(topt, SparseAdamFoldedState):
            topt_spec = SparseAdamFoldedState(count=P())
        elif isinstance(topt, SparseAdamPackedState):
            topt_spec = SparseAdamPackedState(monu=row_sharded, count=P())
        else:
            topt_spec = SparseAdamState(
                mu=row_sharded, nu=row_sharded, count=P())
        rest, table = trainer._without_table(state["params"])
        bstats = state.get("batch_stats") or {}
        batch_specs = (
            P("data", None), P("data", None), P("data", None),
            None if dmask is None else P("data", None), P("data"), P(), P(),
        ) + (P(),) * len(meta)  # unique-row metadata replicated
        fn = jax.shard_map(
            body,
            mesh=mesh,
            # batch_stats replicated in AND out: the in-body psums make the
            # mutated running stats identical on every device
            in_specs=(P(), row_sharded, topt_spec, P(), P(), P())
            + batch_specs,
            out_specs=(P(), row_sharded, topt_spec, P(), P(), P(), P(), P(),
                       P("data", None)),
            check_vma=False,
        )
        (rest, table, topt, opt_state, rng, new_stats, total_loss,
         data_loss, probs) = fn(
            rest, table, state["table_opt"], state["opt_state"], state["rng"],
            bstats, ids, dense, y, dmask, weight, inv, rep, *meta,
        )
        new_state = {
            "params": trainer._with_table(rest, table),
            "batch_stats": new_stats,
            "opt_state": opt_state,
            "rng": rng,
            "table_opt": topt,
        }
        if "epoch_step" in state:
            new_state["epoch_step"] = state["epoch_step"]
        return new_state, total_loss, data_loss, probs

    return step
