"""Decompose the 9.3 ms pallas 40M-row step via STAGE-REMOVED full steps.

probe_40m_step_breakdown.py failed: standalone gather-main sub-programs pay
the ~28 ms dispatch floor.  This keeps every variant a DONATED
state->state train-step-shaped program (the shape that measures 9.3 ms),
removing stages from the top:

  S0 fwd+bwd           loss + grads, state passes through
  S1 +rest-adam        S0 + optax update of the non-embedding params
  S2 +opt-prep         S1 + moment gather + adam math + value/mask buffers
  S3 full              S2 + the write-only kernel (the shipped step)

Stage cost = consecutive difference.  DCE is blocked by folding each
stage's results into the returned loss scalar.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(vocab_per_feature=2_500_000, n_sparse=16, emb_dim=32, batch_size=4096):
    import jax
    import jax.numpy as jnp
    import optax

    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config
    from mmlrec_tpu.train import Trainer
    from mmlrec_tpu.train.sparse_embedding import (
        init_sparse_adam,
        pack_monu,
        two_phase_sparse_adam_unique,
        unpack_monu,
    )

    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=emb_dim, n_sparse=n_sparse,
        n_dense=4, hidden=(256, 128), tower=(64,), gate=(64,),
        batch_size=batch_size, two_phase_embedding=True,
        table_opt_dtype="bfloat16", table_update="pallas",
    )
    cols = [SparseFeat(f"s{i}", vocab_per_feature, emb_dim)
            for i in range(n_sparse)] + [DenseFeat(f"d{i}", 1) for i in range(4)]
    layout = FeatureLayout(cols)
    model = get_model("mmoe", layout, cfg)
    trainer = Trainer(model, seed=0).compile(metrics=[])

    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, vocab_per_feature, (batch_size, n_sparse)).astype(np.int32)
    ids = jnp.asarray(ids_np)
    dense = jnp.asarray(rng.random((batch_size, 4)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (batch_size, 2)), jnp.float32)
    trainer.variables = trainer._init_variables(ids_np[:2], np.asarray(dense[:2]))
    params0 = trainer.variables["params"]
    offs = np.asarray(trainer._fused_offsets)[None, :]
    flat_np = (ids_np.astype(np.int64) + offs).reshape(1, -1)
    meta = trainer._step_metadata(flat_np)
    inv, rep, pids, pinv, nuniq, prep = (jnp.asarray(a[0]) for a in meta)
    weight = jnp.ones((batch_size,), jnp.float32)
    batch7 = (ids, dense, y, None, weight, inv, rep)
    P = trainer._emb_pack_factor
    D = trainer._emb_dim
    B, F = ids.shape
    lr = trainer.cfg.optim_config.lr

    def fwd_bwd(state, rng_key):
        params = state["params"]
        rest, table = trainer._without_table(params)
        flat = (ids + trainer._fused_offsets[None, :]).reshape(-1)
        sup = jnp.take(table, flat // P, axis=0)
        sub = jax.nn.one_hot(flat % P, P, dtype=table.dtype)
        rows = jnp.einsum("kp,kpd->kd", sub, sup.reshape(-1, P, D)
                          ).reshape(B, F, D)
        (total, (dl, ns, probs)), (g_rest, g_rows) = jax.value_and_grad(
            trainer._loss_terms_injected, argnums=(0, 2), has_aux=True)(
            rest, table, rows, state["batch_stats"], batch7, rng_key)
        return rest, table, flat, sup, total, g_rest, g_rows

    def fwd_bwd_nogather(state, rng_key):
        # rows from a tiny constant instead of the 40M-row gather: isolates
        # the model fwd+bwd from the table fetch
        params = state["params"]
        rest, table = trainer._without_table(params)
        flat = (ids + trainer._fused_offsets[None, :]).reshape(-1)
        rows = jnp.broadcast_to(
            jnp.arange(D, dtype=jnp.float32)[None, None, :] * 1e-4, (B, F, D)
        )
        (total, (dl, ns, probs)), (g_rest, g_rows) = jax.value_and_grad(
            trainer._loss_terms_injected, argnums=(0, 2), has_aux=True)(
            rest, table, rows, state["batch_stats"], batch7, rng_key)
        return rest, table, flat, None, total, g_rest, g_rows

    def make_step(stage):
        def step(state):
            rng_key, new_rng = jax.random.split(state["rng"])
            if stage == -3:
                # NOTHING: donated state in -> out.  If this costs ~ms, the
                # backend charges a floor per donated-10GB-state dispatch
                # and the light stages below are floor-bound, not work-bound.
                return dict(state, rng=new_rng), jnp.float32(0)
            if stage == -2:
                # gather+extract only, in the same donated-step shape
                params = state["params"]
                rest, table = trainer._without_table(params)
                flat = (ids + trainer._fused_offsets[None, :]).reshape(-1)
                sup = jnp.take(table, flat // P, axis=0)
                sub = jax.nn.one_hot(flat % P, P, dtype=table.dtype)
                rows = jnp.einsum(
                    "kp,kpd->kd", sub, sup.reshape(-1, P, D))
                return dict(state, rng=new_rng), jnp.sum(rows) * 1e-30
            if stage == -1:
                rest, table, flat, sup, total, g_rest, g_rows = (
                    fwd_bwd_nogather(state, rng_key))
                return dict(state, rng=new_rng), total
            rest, table, flat, sup, total, g_rest, g_rows = fwd_bwd(
                state, rng_key)
            new_state = dict(state, rng=new_rng)
            if stage >= 1:
                updates, opt_state = trainer.tx.update(
                    g_rest, state["opt_state"], rest)
                rest = optax.apply_updates(rest, updates)
                new_state["opt_state"] = opt_state
                new_state["params"] = trainer._with_table(rest, table)
            if stage == 2:
                # opt-prep only: replicate the updater's XLA-side work and
                # fold its results into the loss so nothing DCEs
                st = state["table_opt"]
                g = g_rows.reshape(B * F, D)
                g_sum = jnp.zeros_like(g).at[inv].add(g)
                sup_c = jnp.take(st.monu, flat // P, axis=0)
                mu128, nu128 = unpack_monu(sup_c)
                K = g.shape[0]
                sub = jax.nn.one_hot(flat % P, P, dtype=jnp.float32)
                mu_f = jnp.einsum("kp,kpd->kd", sub,
                                  mu128.astype(jnp.float32).reshape(K, P, D))
                nu_f = jnp.einsum("kp,kpd->kd", sub,
                                  nu128.astype(jnp.float32).reshape(K, P, D))
                cnt = (st.count + 1).astype(jnp.float32)
                new_mu = 0.9 * mu_f + 0.1 * g_sum
                new_nu = 0.999 * nu_f + 0.001 * g_sum * g_sum
                mu_hat = new_mu / (1.0 - 0.9 ** cnt)
                nu_hat = new_nu / (1.0 - 0.999 ** cnt)
                r = rep[:, None]
                d_t = -lr * mu_hat / (jnp.sqrt(nu_hat) + 1e-8) * r

                def widen(x):
                    return jnp.einsum("kp,kd->kpd", sub, x).reshape(K, P * D)

                Kp = pids.shape[0]
                acc_t = jnp.zeros((Kp, 128), jnp.float32).at[pinv].add(widen(d_t))
                vals_c = pack_monu(widen(new_mu).astype(jnp.bfloat16),
                                   widen(new_nu).astype(jnp.bfloat16))
                own = widen(jnp.broadcast_to(r, (K, D)))
                vals_i = jnp.where(
                    own > 0, jax.lax.bitcast_convert_type(vals_c, jnp.int32), 0)
                acc_vals = jax.lax.bitcast_convert_type(
                    jnp.zeros((Kp, 128), jnp.int32).at[pinv].add(vals_i),
                    jnp.float32)
                acc_mask = jnp.zeros((Kp, 128), jnp.float32).at[pinv].add(own)
                base_t = jnp.zeros((Kp, 128), jnp.float32).at[pinv].set(sup)
                base_c = jnp.zeros((Kp, 128), jnp.float32).at[pinv].set(sup_c)
                vt = base_t + acc_t
                vc = jnp.where(acc_mask > 0, acc_vals, base_c)
                total = total + 1e-30 * (jnp.sum(vt[0]) + jnp.sum(vc[0]))
                new_state["table_opt"] = type(st)(
                    monu=st.monu, count=st.count + 1)
            if stage >= 3:
                st = state["table_opt"]
                g = g_rows.reshape(B * F, D)
                new_table, new_opt = two_phase_sparse_adam_unique(
                    table, g, flat, inv, rep, pids, pinv, st, lr=lr,
                    pack_factor=P, use_pallas=True, interpret=False,
                    n_real=nuniq, sup=sup, prep=prep)
                new_state["params"] = trainer._with_table(
                    new_state["params"] if stage >= 1 else rest, new_table)
                new_state["table_opt"] = new_opt
            return new_state, total
        return jax.jit(step, donate_argnums=(0,))

    def chain(state, total):
        leaf = state["params"]["embeddings"]["fused"]["table"]
        float(np.asarray(leaf[0, 0]))
        return float(np.asarray(total))

    results = {}
    all_stages = [(-3, "Sf noop"), (-2, "Sg gather-only"),
                  (-1, "Sn fwd+bwd nogather"), (0, "S0 fwd+bwd"),
                  (1, "S1 +rest-adam"), (2, "S2 +opt-prep"), (3, "S3 full")]
    sel = os.environ.get("STAGES")
    if sel:
        want = set(int(s) for s in sel.split(","))
        all_stages = [(s, n) for s, n in all_stages if s in want]
    for stage, name in all_stages:
        step = make_step(stage)
        state = {
            "params": jax.tree_util.tree_map(jnp.copy, params0),
            "batch_stats": trainer.variables.get("batch_stats", {}),
            "opt_state": trainer.tx.init(trainer._without_table(params0)[0]),
            "rng": jax.random.PRNGKey(1),
            "table_opt": init_sparse_adam(
                params0["embeddings"]["fused"]["table"], packed=True),
        }
        state, total = step(state)
        chain(state, total)
        best = float("inf")
        for r_ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                state, total = step(state)
            chain(state, total)
            best = min(best, (time.perf_counter() - t0) / 10)
        results[name] = best
        print(f"{name:14s} {best*1e3:7.2f} ms", flush=True)
        del state

    prev = 0.0
    print("--- stage deltas ---")
    for k, v in results.items():
        print(f"{k:14s} +{(v-prev)*1e3:6.2f} ms")
        prev = v


if __name__ == "__main__":
    main()
