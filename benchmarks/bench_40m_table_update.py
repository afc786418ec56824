"""40M-row two-phase training step: table_update scatter vs unique vs pallas.

Micro-probes (probe_scatter_flags.py, bench_pallas_rows_add.py) rank the
update variants pallas < unique+sorted < default scatter at [2.5M x 128]
K=65k (~95 / ~119 / ~134 ns/row-equivalent beyond the gather floor), but
windows vary 2-3x — this measures the REAL flagship-shape train step at
40M x 32 (bf16 moments) for each mode, back-to-back in one window.

Usage: python benchmarks/bench_40m_table_update.py [mode ...]
(default: scatter pallas unique).  Env: MOMENT_DTYPE (default bfloat16 —
the pallas mode stores bf16 moments as (mu, nu) pairs packed into f32
lanes, since Mosaic cannot row-slice bf16 HBM arrays), VOCAB_PER_FEATURE
(default 2_500_000), ZIPF, SCAN_STEPS.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


MOMENT_DTYPE = os.environ.get("MOMENT_DTYPE", "bfloat16")
VOCAB = int(os.environ.get("VOCAB_PER_FEATURE", 2_500_000))
# 0 = uniform ids; else Zipf exponent (e.g. 1.1) — real recommender traffic
# is skewed, which shrinks the batch's unique-row set and so favors the
# duplicate-free update paths.
ZIPF = float(os.environ.get("ZIPF", "0"))


def run(mode: str, vocab_per_feature: int = VOCAB, n_sparse: int = 16,
        emb_dim: int = 32, batch_size: int = 4096):
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config
    from mmlrec_tpu.train import Trainer
    from mmlrec_tpu.train.sparse_embedding import (
        SparseAdamFoldedState,
        init_sparse_adam,
    )

    kw = dict(
        task_name="mtl", model_name="mmoe", emb=emb_dim, n_sparse=n_sparse,
        n_dense=4, hidden=(256, 128), tower=(64,), gate=(64,),
        batch_size=batch_size, two_phase_embedding=True,
        table_opt_dtype=MOMENT_DTYPE,
    )
    # always explicit: the trainer's default is now "auto", which would
    # silently turn the scatter baseline into pallas on TPU
    kw["table_update"] = mode
    # MONU_GATHER=xla|pallas A/Bs the moment-container gather routing
    if os.environ.get("MONU_GATHER"):
        kw["monu_gather"] = os.environ["MONU_GATHER"]
    # TABLE_CONTAINER=stacked folds the moment container into the table
    # param ([2Vp, 128]) for single-strided-DMA dual row writes
    if os.environ.get("TABLE_CONTAINER"):
        kw["table_container"] = os.environ["TABLE_CONTAINER"]
    # DEDUP_ROUTE=scatter|gather pins the unique-slot accumulation route
    if os.environ.get("DEDUP_ROUTE"):
        kw["dedup_route"] = os.environ["DEDUP_ROUTE"]
    # PAIR_GATHER=split|dual pins the stacked (table, monu) row fetch route
    if os.environ.get("PAIR_GATHER"):
        kw["pair_gather"] = os.environ["PAIR_GATHER"]
    # UPDATE_SPACE=slot runs the slot-space update (round 4)
    if os.environ.get("UPDATE_SPACE"):
        kw["update_space"] = os.environ["UPDATE_SPACE"]
    cfg = make_config(**kw)
    cols = [SparseFeat(f"s{i}", vocab_per_feature, emb_dim)
            for i in range(n_sparse)] + [DenseFeat(f"d{i}", 1) for i in range(4)]
    layout = FeatureLayout(cols)
    model = get_model("mmoe", layout, cfg)
    trainer = Trainer(model, seed=0).compile(metrics=[])

    rng = np.random.default_rng(0)
    if ZIPF:
        ids_np = (rng.zipf(ZIPF, (batch_size, n_sparse)) - 1) % vocab_per_feature
        ids_np = ids_np.astype(np.int32)
    else:
        ids_np = rng.integers(0, vocab_per_feature, (batch_size, n_sparse)).astype(np.int32)
    ids = jnp.asarray(ids_np)
    dense = jnp.asarray(rng.random((batch_size, 4)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (batch_size, 2)), jnp.float32)
    trainer.variables = trainer._init_variables(
        np.asarray(ids[:2]), np.asarray(dense[:2]))
    params = trainer.variables["params"]
    table = params["embeddings"]["fused"]["table"]
    state = {
        "params": params,
        "batch_stats": trainer.variables.get("batch_stats", {}),
        "opt_state": trainer.tx.init(trainer._without_table(params)[0]),
        "rng": jax.random.PRNGKey(1),
        # mirrors Trainer: pallas + bf16 -> (mu, nu) pairs packed into
        # f32 lanes (Mosaic cannot row-slice bf16 HBM arrays); stacked ->
        # the moments live in the fat table param, count-only state
        "table_opt": (
            SparseAdamFoldedState(count=jnp.zeros((), jnp.int32))
            if os.environ.get("TABLE_CONTAINER") == "stacked"
            else init_sparse_adam(
                table, dtype=MOMENT_DTYPE,
                packed=mode == "pallas" and MOMENT_DTYPE == "bfloat16",
            )
        ),
    }
    offs = np.asarray(trainer._fused_offsets)[None, :]
    flat = (ids_np.astype(np.int64) + offs).reshape(1, -1)
    meta = trainer._step_metadata(flat)
    uniq = len(np.unique(flat[0]))
    print(f"[{mode}] {uniq} unique of {flat.shape[1]} ids"
          + (f" (zipf {ZIPF})" if ZIPF else ""), flush=True)
    batch = (ids, dense, y, None, jnp.ones((batch_size,), jnp.float32),
             ) + tuple(jnp.asarray(a[0]) for a in meta)

    step = trainer._make_train_step()

    # SCAN_STEPS=N runs N train steps per dispatch via lax.scan: the
    # no-op-step probe (probe_40m_step_stages.py) measured a ~6.3 ms
    # PER-DISPATCH floor when the donated state is ~10 GB, so amortizing
    # dispatches is worth more than any kernel work at this scale.
    scan_n = int(os.environ.get("SCAN_STEPS", "0"))
    if scan_n:
        import jax as _jax

        def body(state, _):
            state, total, dl, probs = trainer._step_body(state, batch)
            return state, total

        @functools.partial(_jax.jit, donate_argnums=(0,))
        def scan_step(state):
            return _jax.lax.scan(body, state, None, length=scan_n)

        def step(state, batch_):
            state, totals = scan_step(state)
            return state, totals[-1], None, None

    def chain_sync(s):
        leaf = s["params"]["embeddings"]["fused"]["table"]
        return float(np.asarray(leaf[(0,) * leaf.ndim]))

    t0 = time.perf_counter()
    state, *_ = step(state, batch)
    chain_sync(state)
    print(f"[{mode}] compiled+first step in {time.perf_counter() - t0:.0f}s",
          flush=True)

    iters = 10
    per_call = scan_n if scan_n else 1
    best = float("inf")
    for r in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, *_ = step(state, batch)
        chain_sync(state)
        dt = (time.perf_counter() - t0) / (iters * per_call)
        best = min(best, dt)
        print(f"[{mode}] round {r}: {dt*1e3:.1f} ms/step", flush=True)

    print(json.dumps({
        "metric": "40m_row_step_table_update",
        "mode": mode,
        "moment_dtype": MOMENT_DTYPE,
        "zipf": ZIPF,
        "total_vocab": VOCAB * 16,
        "ms_per_step": round(best * 1e3, 1),
        "examples_per_s": round(batch_size / best, 0),
    }), flush=True)
    # free the 7.6 GB of state before the next mode runs
    del state, params, table, trainer
    return best


if __name__ == "__main__":
    modes = sys.argv[1:] or ["scatter", "pallas", "unique"]
    results = {m: run(m) for m in modes}
    if len(results) > 1:
        base = results.get("scatter") or max(results.values())
        for m, t in results.items():
            print(f"{m:8s} {t*1e3:7.1f} ms/step  ({base/t:.2f}x vs scatter)")
