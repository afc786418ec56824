"""Decompose the 40M-row pallas train step (9.7 ms) into its stages.

Times nested sub-programs sharing the same inputs (chain-synced scalar
readbacks), so stage cost = difference between consecutive rows:

  A gather      phase-1 row gather + reduce
  B fwd         A + model forward (injected rows) + loss
  C fwd+bwd     value_and_grad w.r.t. (rest, rows)
  D +optprep    C + moment gather/math/acc buffers (update NOT applied)
  E full        the real donated train step (kernel + optax rest update)

Run on TPU: python benchmarks/probe_40m_step_breakdown.py
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

    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config
    from mmlrec_tpu.train import Trainer
    from mmlrec_tpu.train.sparse_embedding import (
        gather_rows,
        init_sparse_adam,
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
    trainer.variables = trainer._init_variables(ids_np[:2], dense[:2])
    params = trainer.variables["params"]
    table = params["embeddings"]["fused"]["table"]
    topt = init_sparse_adam(table, packed=True)
    offs = np.asarray(trainer._fused_offsets)[None, :]
    flat_np = (ids_np.astype(np.int64) + offs).reshape(1, -1)
    meta = trainer._step_metadata(flat_np)
    inv, rep, pids, pinv, nuniq = (jnp.asarray(a[0]) for a in meta)
    weight = jnp.ones((batch_size,), jnp.float32)
    batch = (ids, dense, y, None, weight, inv, rep)
    P = trainer._emb_pack_factor
    B, F = ids.shape
    rest, _ = trainer._without_table(params)
    rng_key = jax.random.PRNGKey(1)

    def flat_of(ids):
        return (ids + trainer._fused_offsets[None, :]).reshape(-1)

    @jax.jit
    def a_gather(table, ids):
        rows = gather_rows(table, flat_of(ids), trainer._emb_dim, P)
        return jnp.sum(rows)

    @jax.jit
    def b_fwd(rest, table, ids, dense, y, weight, inv, rep):
        flat = flat_of(ids)
        rows = gather_rows(table, flat, trainer._emb_dim, P).reshape(
            B, F, trainer._emb_dim)
        total, _ = trainer._loss_terms_injected(
            rest, table, rows, {}, (ids, dense, y, None, weight, inv, rep),
            rng_key)
        return total

    @jax.jit
    def c_bwd(rest, table, ids, dense, y, weight, inv, rep):
        flat = flat_of(ids)
        rows = gather_rows(table, flat, trainer._emb_dim, P).reshape(
            B, F, trainer._emb_dim)
        (total, _), (g_rest, g_rows) = jax.value_and_grad(
            trainer._loss_terms_injected, argnums=(0, 2), has_aux=True)(
            rest, table, rows, {}, (ids, dense, y, None, weight, inv, rep),
            rng_key)
        return total, jax.tree_util.tree_leaves(g_rest)[0].ravel()[0], jnp.sum(g_rows)

    @jax.jit
    def d_optprep(rest, table, monu, ids, dense, y, weight, inv, rep, pinv):
        flat = flat_of(ids)
        rows = gather_rows(table, flat, trainer._emb_dim, P).reshape(
            B, F, trainer._emb_dim)
        (total, _), (g_rest, g_rows) = jax.value_and_grad(
            trainer._loss_terms_injected, argnums=(0, 2), has_aux=True)(
            rest, table, rows, {}, (ids, dense, y, None, weight, inv, rep),
            rng_key)
        # moment gather + adam math + acc buffers, WITHOUT the RMW kernel
        g = g_rows.reshape(B * F, trainer._emb_dim)
        g_sum = jnp.zeros_like(g).at[inv].add(g)
        sup = jnp.take(monu, flat // P, axis=0)
        mu128, nu128 = unpack_monu(sup)
        K = g.shape[0]
        sub = jax.nn.one_hot(flat % P, P, dtype=jnp.float32)
        mu_f = jnp.einsum("kp,kpd->kd", sub,
                          mu128.astype(jnp.float32).reshape(K, P, trainer._emb_dim))
        nu_f = jnp.einsum("kp,kpd->kd", sub,
                          nu128.astype(jnp.float32).reshape(K, P, trainer._emb_dim))
        new_mu = 0.9 * mu_f + 0.1 * g_sum
        new_nu = 0.999 * nu_f + 0.001 * g_sum * g_sum
        upd = -0.001 * new_mu / (jnp.sqrt(new_nu) + 1e-8) * rep[:, None]
        wide = jnp.einsum("kp,kd->kpd", sub, upd).reshape(K, 128)
        acc_t = jnp.zeros((pids.shape[0], 128), jnp.float32).at[pinv].add(wide)
        return total, jnp.sum(acc_t), jnp.sum(new_nu)

    step = trainer._make_train_step()
    state = {
        "params": params,
        "batch_stats": trainer.variables.get("batch_stats", {}),
        "opt_state": trainer.tx.init(rest),
        "rng": jax.random.PRNGKey(1),
        "table_opt": topt,
    }
    full_batch = batch + (pids, pinv, nuniq)

    def chain(x):
        return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))

    def best_of(fn, n=6):
        out = fn(); chain(out)
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            chain(out)
            best = min(best, time.perf_counter() - t0)
        return best

    tbl = params["embeddings"]["fused"]["table"]
    rows_ms = {}
    rows_ms["A gather"] = best_of(lambda: a_gather(tbl, ids))
    rows_ms["B fwd"] = best_of(lambda: b_fwd(rest, tbl, ids, dense, y, weight, inv, rep))
    rows_ms["C fwd+bwd"] = best_of(lambda: c_bwd(rest, tbl, ids, dense, y, weight, inv, rep))
    rows_ms["D +optprep"] = best_of(
        lambda: d_optprep(rest, tbl, topt.monu, ids, dense, y, weight, inv, rep, pinv))

    # full donated step last (it consumes/reproduces state)
    st = [state]
    def run_full():
        st[0], *_ = step(st[0], full_batch)
        return st[0]["params"]["embeddings"]["fused"]["table"]
    out = run_full(); chain(out)
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        out = run_full()
        chain(out)
        best = min(best, time.perf_counter() - t0)
    rows_ms["E full step"] = best

    prev = 0.0
    for k, v in rows_ms.items():
        print(f"{k:12s} {v*1e3:7.2f} ms  (+{(v-prev)*1e3:6.2f})")
        prev = v


if __name__ == "__main__":
    main()
