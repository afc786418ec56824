"""Decompose the ROUND-4 (3.4 ms) scanned 40M-row stacked step.

The shipped recipe is now: stacked [2Vp, 128] container + wide-lane Adam
math (integer-shift pack/unpack) + per-plane gather-route dedup + dual
strided-write kernel + scan-32.  Cost analysis says 2521 MB/step -> 3.08
ms HBM bound, measured ~3.4 ms (90.6%).  This probe isolates what is left
by removing one stage at a time from full-step-shaped scan-32 donated
programs, all measured in the same window:

  full       the shipped step (sanity: should reproduce ~3.4 ms)
  nomath     Adam math replaced by trivial functions of the gathered rows
             (keeps both gathers, g_sum, int32 fold, route, kernel)
  nofold     contribs written directly (no where/prep old-row folding)
  nogsum     g_sum scatter replaced by g (keeps everything else)
  noroute    route gather+resid replaced by a slice (same shapes)
  nomonu     monu gather replaced by zeros
  nokernel   dual-write kernel skipped (state passes through)
  noop       dispatch floor / 32

Stage cost = full - no<stage> (dependency-stall caveats apply; see
docs/perf_notes.md "Measurement discipline").  Chain-synced, best-of-N.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCAN = int(os.environ.get("SCAN_STEPS", "32"))
ZIPF = float(os.environ.get("ZIPF", "0"))
VARIANTS = (
    os.environ["VARIANTS"].split(",")
    if os.environ.get("VARIANTS")
    else ["full", "nomath", "nofold", "nogsum", "noroute", "nomonu",
          "nokernel", "noop"]
)


def main(vocab_per_feature=2_500_000, n_sparse=16, emb_dim=32,
         batch_size=4096):
    import jax
    import jax.numpy as jnp
    import optax

    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.ops.pallas_scatter import pallas_rows_write_dual
    from mmlrec_tpu.synthetic import make_config
    from mmlrec_tpu.train import Trainer
    from mmlrec_tpu.train.sparse_embedding import (
        SparseAdamFoldedState,
        pack_monu_rounded,
        unpack_monu_f32,
    )

    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=emb_dim, n_sparse=n_sparse,
        n_dense=4, hidden=(256, 128), tower=(64,), gate=(64,),
        batch_size=batch_size, two_phase_embedding=True,
        table_opt_dtype="bfloat16", table_update="pallas",
        table_container="stacked",
    )
    cols = [SparseFeat(f"s{i}", vocab_per_feature, emb_dim)
            for i in range(n_sparse)] + [
        DenseFeat(f"d{i}", 1) for i in range(4)]
    layout = FeatureLayout(cols)
    model = get_model("mmoe", layout, cfg)
    trainer = Trainer(model, seed=0).compile(metrics=[])

    rng = np.random.default_rng(0)
    if ZIPF:
        ids_np = ((rng.zipf(ZIPF, (batch_size, n_sparse)) - 1)
                  % vocab_per_feature).astype(np.int32)
    else:
        ids_np = rng.integers(
            0, vocab_per_feature, (batch_size, n_sparse)).astype(np.int32)
    ids = jnp.asarray(ids_np)
    dense = jnp.asarray(rng.random((batch_size, 4)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (batch_size, 2)), jnp.float32)
    trainer.variables = trainer._init_variables(
        ids_np[:2], np.asarray(dense[:2]))
    params0 = trainer.variables["params"]
    offs = np.asarray(trainer._fused_offsets)[None, :]
    flat_np = (ids_np.astype(np.int64) + offs).reshape(1, -1)
    meta = trainer._step_metadata(flat_np)
    (inv, rep, pids, pinv, nuniq, prep, accperm, resid_pos, resid_slot,
     gdup_pos, gdup_tgt) = (jnp.asarray(a[0]) for a in meta)
    weight = jnp.ones((batch_size,), jnp.float32)
    batch7 = (ids, dense, y, None, weight, inv, rep)
    P = trainer._emb_pack_factor
    D = trainer._emb_dim
    B, F = ids.shape
    K = B * F
    Kp = pids.shape[0]
    W = P * D
    lr = trainer.cfg.optim_config.lr
    b1, b2, eps = 0.9, 0.999, 1e-8
    fat = params0["embeddings"]["fused"]["table"]
    Vp = fat.shape[0] // 2

    own_mask_np = (
        (np.arange(W, dtype=np.int32) // D)[None, :]
        == (np.asarray(flat_np[0]) % P).astype(np.int32)[:, None])
    own_mask = jnp.asarray(own_mask_np)

    def fwd_bwd(state, rng_key):
        rest, table = trainer._without_table(state["params"])
        flat = (ids + trainer._fused_offsets[None, :]).reshape(-1)
        sup = jnp.take(table, flat // P, axis=0)
        sub = jax.nn.one_hot(flat % P, P, dtype=table.dtype)
        rows = jnp.einsum("kp,kpd->kd", sub, sup.reshape(-1, P, D)
                          ).reshape(B, F, D)
        (total, (dl, ns, probs)), (g_rest, g_rows) = jax.value_and_grad(
            trainer._loss_terms_injected, argnums=(0, 2), has_aux=True)(
            rest, table, rows, state["batch_stats"], batch7, rng_key)
        return rest, table, flat, sup, total, g_rest, g_rows

    def make_step(stage):
        def body(state, _):
            rng_key, new_rng = jax.random.split(state["rng"])
            new_state = dict(state, rng=new_rng)
            if stage == "noop":
                return new_state, jnp.float32(0)
            rest, table, flat, sup, total, g_rest, g_rows = fwd_bwd(
                state, rng_key)
            updates, opt_state = trainer.tx.update(
                g_rest, state["opt_state"], rest)
            rest = optax.apply_updates(rest, updates)
            new_state["opt_state"] = opt_state
            st = state["table_opt"]
            g = g_rows.reshape(K, D)
            g_sum = g if stage == "nogsum" else (
                jnp.zeros_like(g).at[inv].add(g))
            if stage == "nomonu":
                sup_c = jnp.zeros((K, W), jnp.float32)
            else:
                sup_c = jnp.take(table, Vp + flat // P, axis=0)
            r = rep[:, None]
            g_w = jnp.where(own_mask, jnp.broadcast_to(
                g_sum[:, None, :], (K, P, D)).reshape(K, W), 0.0)
            if stage == "nomath":
                # same input/output shapes, no Adam chain
                d_table_w = lr * g_w
                vals_c = sup_c + g_w
            else:
                mu_w, nu_w = unpack_monu_f32(sup_c)
                cnt = (st.count + 1).astype(jnp.float32)
                new_mu_w = b1 * mu_w + (1 - b1) * g_w
                new_nu_w = b2 * nu_w + (1 - b2) * g_w * g_w
                mu_hat = new_mu_w / (1.0 - b1 ** cnt)
                nu_hat = new_nu_w / (1.0 - b2 ** cnt)
                d_table_w = -lr * mu_hat / (jnp.sqrt(nu_hat) + eps) * r
                vals_c = pack_monu_rounded(new_mu_w, new_nu_w)
            own = jnp.where(own_mask, jnp.broadcast_to(r, (K, W)), 0.0)
            old_i = jax.lax.bitcast_convert_type(sup_c, jnp.int32)
            new_i = jax.lax.bitcast_convert_type(vals_c, jnp.int32)
            new_t = sup + jnp.where(own_mask, d_table_w, 0.0)
            old_ti = jax.lax.bitcast_convert_type(sup, jnp.int32)
            if stage == "nofold":
                contrib_t_i = jax.lax.bitcast_convert_type(new_t, jnp.int32)
                contrib_monu_i = new_i
            else:
                contrib_monu_i = (
                    jnp.where(own > 0, new_i - old_i, 0)
                    + prep.astype(jnp.int32)[:, None] * old_i)
                contrib_t_i = (
                    jnp.where(
                        own > 0,
                        jax.lax.bitcast_convert_type(new_t, jnp.int32)
                        - old_ti, 0)
                    + prep.astype(jnp.int32)[:, None] * old_ti)
            if stage == "noroute":
                accd = jnp.stack([contrib_t_i[:Kp], contrib_monu_i[:Kp]])
            else:
                def plane(c):
                    return c[accperm].at[resid_slot].add(
                        c[resid_pos], mode="drop")

                accd = jnp.stack(
                    [plane(contrib_t_i), plane(contrib_monu_i)])
            if stage == "nokernel":
                # consume accd so it is not DCE'd; keep state shapes
                total = total + accd[0, 0, 0].astype(jnp.float32) * 1e-30
                new_state["params"] = trainer._with_table(rest, table)
                new_state["table_opt"] = SparseAdamFoldedState(
                    count=st.count + 1)
                return new_state, total
            new_stacked = pallas_rows_write_dual(
                table.reshape(2, Vp, W), pids,
                jax.lax.bitcast_convert_type(accd, jnp.float32),
                n_real=nuniq, chunk=256)
            new_state["params"] = trainer._with_table(
                rest, new_stacked.reshape(table.shape))
            new_state["table_opt"] = SparseAdamFoldedState(count=st.count + 1)
            return new_state, total

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state):
            state, totals = jax.lax.scan(body, state, None, length=SCAN)
            return state, totals[-1]

        return step

    def chain_sync(s):
        leaf = s["params"]["embeddings"]["fused"]["table"]
        return float(np.asarray(leaf[(0,) * leaf.ndim]))

    # ONE ~10 GB state threaded (donated) through EVERY variant: the
    # 16 GB chip cannot hold two.  All variants share the state
    # STRUCTURE; values drift into garbage across variants, which is fine
    # for timing (each program's work is data-independent).
    state = {
        "params": params0,
        "batch_stats": trainer.variables.get("batch_stats", {}),
        "opt_state": trainer.tx.init(trainer._without_table(params0)[0]),
        "rng": jax.random.PRNGKey(1),
        "table_opt": SparseAdamFoldedState(count=jnp.zeros((), jnp.int32)),
    }
    del params0
    trainer.variables = None

    steps = {v: make_step(v) for v in VARIANTS}
    # compile all first (same window for the measurements that follow)
    for v in VARIANTS:
        t0 = time.perf_counter()
        state, _ = steps[v](state)
        chain_sync(state)
        print(f"[{v}] compiled in {time.perf_counter() - t0:.0f}s",
              flush=True)

    iters = 6
    best = {v: float("inf") for v in VARIANTS}
    for rnd in range(4):
        for v in VARIANTS:
            t0 = time.perf_counter()
            for _ in range(iters):
                state, _ = steps[v](state)
            chain_sync(state)
            dt = (time.perf_counter() - t0) / (iters * SCAN)
            best[v] = min(best[v], dt)
        print({v: round(best[v] * 1e6) for v in VARIANTS}, flush=True)

    out = {v: round(best[v] * 1e6, 1) for v in VARIANTS}
    full = best.get("full")
    deltas = {
        v: round((full - best[v]) * 1e6, 1)
        for v in VARIANTS if v != "full" and full
    }
    print(json.dumps({
        "metric": "40m_wide_stage_probe", "scan": SCAN,
        "us_per_step": out, "full_minus_variant_us": deltas,
    }), flush=True)


if __name__ == "__main__":
    main()
