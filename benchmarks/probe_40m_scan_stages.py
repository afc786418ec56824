"""Decompose the CURRENT (round-2, 5.8 ms) scanned 40M-row pallas step.

probe_40m_step_stages.py predates two things that define today's step: the
16-step lax.scan dispatch (scan_steps) and the folded opt-prep (ONE merged
[Kp, 2W] int32 accumulation scatter).  This probe re-derives the stage
costs with every variant a scan-16 donated full-step-shaped program:

  V0 noop          donated state in -> out          (dispatch floor / 16)
  V1 fwd+bwd       table gather + extract + model fwd/bwd
  V2 +rest-adam    V1 + optax update of dense params
  V3 +opt-prep     V2 + g_sum + monu gather + adam math + widen + acc2
  V3ng             V3 with the monu gather replaced by zeros (isolates it)
  V3ns             V3 with the acc2 dedup scatter replaced by a reshape
                   (isolates the [Kp, 2W] scatter)
  V4 full          V3 + the write-only kernel == the shipped step

Consecutive differences = stage costs; V3 - V3ng = the moment gather,
V3 - V3ns = the accumulation scatter.  Chain-synced, best-of-N.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCAN = int(os.environ.get("SCAN_STEPS", "16"))


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
        unpack_monu,
    )
    from mmlrec_tpu.ops.pallas_scatter import (
        pallas_rows_write,
        pallas_rows_write_pipelined,
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
    K = B * F
    Kp = pids.shape[0]
    lr = trainer.cfg.optim_config.lr
    b1, b2, eps = 0.9, 0.999, 1e-8

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
        return rest, table, flat, sup, sub, total, g_rest, g_rows

    def opt_prep(state, flat, sup, sub, g_rows, gather_monu=True,
                 dedup_scatter=True, sup_c=None):
        """The CURRENT folded opt-prep (two_phase_sparse_adam_unique packed
        pallas branch, train/sparse_embedding.py:464-539)."""
        st = state["table_opt"]
        g = g_rows.reshape(K, D)
        g_sum = jnp.zeros_like(g).at[inv].add(g)
        if sup_c is not None:
            pass  # pre-gathered (hoisted before fwd/bwd)
        elif gather_monu:
            sup_c = jnp.take(st.monu, flat // P, axis=0)
        else:
            sup_c = jnp.zeros((K, 128), jnp.float32)
        mu128, nu128 = unpack_monu(sup_c)
        subf = sub.astype(jnp.float32)
        mu_f = jnp.einsum("kp,kpd->kd", subf,
                          mu128.astype(jnp.float32).reshape(K, P, D))
        nu_f = jnp.einsum("kp,kpd->kd", subf,
                          nu128.astype(jnp.float32).reshape(K, P, D))
        cnt = (st.count + 1).astype(jnp.float32)
        new_mu = b1 * mu_f + (1 - b1) * g_sum
        new_nu = b2 * nu_f + (1 - b2) * g_sum * g_sum
        mu_hat = new_mu / (1.0 - b1 ** cnt)
        nu_hat = new_nu / (1.0 - b2 ** cnt)
        r = rep[:, None]
        d_table = -lr * mu_hat / (jnp.sqrt(nu_hat) + eps) * r

        def widen(x):
            return jnp.einsum("kp,kd->kpd", subf, x).reshape(K, P * D)

        vals_c = pack_monu(widen(new_mu).astype(jnp.bfloat16),
                           widen(new_nu).astype(jnp.bfloat16))
        own = widen(jnp.broadcast_to(r, (K, D)))
        old_i = jax.lax.bitcast_convert_type(sup_c, jnp.int32)
        new_i = jax.lax.bitcast_convert_type(vals_c, jnp.int32)
        contrib_monu_i = (
            jnp.where(own > 0, new_i - old_i, 0)
            + prep.astype(jnp.int32)[:, None] * old_i
        )
        old_ti = jax.lax.bitcast_convert_type(sup, jnp.int32)
        new_t = sup + widen(d_table)
        contrib_t_i = (
            jnp.where(own > 0,
                      jax.lax.bitcast_convert_type(new_t, jnp.int32) - old_ti,
                      0)
            + prep.astype(jnp.int32)[:, None] * old_ti
        )
        both = jnp.concatenate([contrib_t_i, contrib_monu_i], axis=1)
        if dedup_scatter == "split":
            # two [Kp, 128] scatters instead of one [Kp, 256]: re-check
            # whether 256-lane scatters fall off the 128-lane fast path the
            # way 256-lane gathers do (probe_fused_container_gather.py)
            at = jnp.zeros((Kp, 128), jnp.int32).at[pinv].add(contrib_t_i)
            am = jnp.zeros((Kp, 128), jnp.int32).at[pinv].add(contrib_monu_i)
            acc2 = jnp.concatenate([at, am], axis=1)
        elif dedup_scatter:
            acc2 = jnp.zeros((Kp, 256), jnp.int32).at[pinv].add(both)
        else:
            acc2 = both[:Kp]  # same shape/dtype, no scatter (WRONG values)
        acc_t = jax.lax.bitcast_convert_type(acc2[:, :128], jnp.float32)
        acc_monu = jax.lax.bitcast_convert_type(acc2[:, 128:], jnp.float32)
        return acc_t, acc_monu

    def make_step(stage):
        def body(state, _):
            rng_key, new_rng = jax.random.split(state["rng"])
            new_state = dict(state, rng=new_rng)
            if stage == "V0":
                return new_state, jnp.float32(0)
            sup_c_pre = None
            if stage == "V4h":
                # hoist the moment gather BEFORE the model fwd/bwd in trace
                # order — a scheduler hint to overlap it with the model step
                # the way the table gather already overlaps
                flat_pre = (ids + trainer._fused_offsets[None, :]).reshape(-1)
                sup_c_pre = jnp.take(
                    state["table_opt"].monu, flat_pre // P, axis=0)
            rest, table, flat, sup, sub, total, g_rest, g_rows = fwd_bwd(
                state, rng_key)
            if stage != "V1":
                updates, opt_state = trainer.tx.update(
                    g_rest, state["opt_state"], rest)
                rest = optax.apply_updates(rest, updates)
                new_state["opt_state"] = opt_state
                new_state["params"] = trainer._with_table(rest, table)
            if stage.startswith(("V3", "V4")):
                acc_t, acc_monu = opt_prep(
                    state, flat, sup, sub, g_rows,
                    gather_monu=stage != "V3ng",
                    dedup_scatter=(
                        "split" if stage.endswith("s2") else stage != "V3ns"
                    ),
                    sup_c=sup_c_pre,
                )
                if stage.startswith("V4"):
                    st = state["table_opt"]
                    if stage == "V4pp":
                        # software-pipelined kernel: deferred waits +
                        # manual double-buffered value windows
                        new_table, new_monu = pallas_rows_write_pipelined(
                            (table, st.monu), pids, (acc_t, acc_monu),
                            n_real=nuniq, chunk=256,
                        )
                    elif stage == "V4sp":
                        # two kernel calls: step i+1's table gather then
                        # depends only on the table write, and the monu
                        # gather only on the monu write — lets the
                        # scheduler overlap each gather with the OTHER
                        # array's write across scan iterations
                        (new_table,) = pallas_rows_write(
                            (table,), pids, (acc_t,), n_real=nuniq, chunk=256)
                        (new_monu,) = pallas_rows_write(
                            (st.monu,), pids, (acc_monu,), n_real=nuniq,
                            chunk=256)
                    else:
                        new_table, new_monu = pallas_rows_write(
                            (table, st.monu), pids, (acc_t, acc_monu),
                            n_real=nuniq, chunk=256,
                        )
                    new_state["params"] = trainer._with_table(rest, new_table)
                    new_state["table_opt"] = type(st)(
                        monu=new_monu, count=st.count + 1)
                else:
                    total = total + 1e-30 * (jnp.sum(acc_t[0]) + jnp.sum(acc_monu[0]))
            return new_state, total

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state):
            return jax.lax.scan(body, state, None, length=SCAN)

        return step

    def chain(state):
        leaf = state["params"]["embeddings"]["fused"]["table"]
        return float(np.asarray(leaf[0, 0]))

    stages = os.environ.get(
        "STAGES", "V0,V1,V2,V3,V3ng,V3ns,V4").split(",")
    results = {}
    for name in stages:
        step = make_step(name)
        state = {
            "params": jax.tree_util.tree_map(jnp.copy, params0),
            "batch_stats": trainer.variables.get("batch_stats", {}),
            "opt_state": trainer.tx.init(trainer._without_table(params0)[0]),
            "rng": jax.random.PRNGKey(1),
            "table_opt": init_sparse_adam(
                params0["embeddings"]["fused"]["table"], packed=True),
        }
        t0 = time.perf_counter()
        state, _ = step(state)
        chain(state)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(4):
                state, _ = step(state)
            chain(state)
            best = min(best, (time.perf_counter() - t0) / (4 * SCAN))
        results[name] = round(best * 1e3, 2)
        print(f"{name:5s} {best*1e3:6.2f} ms/step  (compile {compile_s:.0f}s)",
              flush=True)
        del state
    print(json.dumps(results))


if __name__ == "__main__":
    main()
