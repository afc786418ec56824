"""40M-row (5.1 GB) fused-table training with bf16 SparseAdam moments.

Round-1 found the 40M x 32 table trains via two_phase_embedding but sits
within 0.5 GB of the 15.75 GB HBM limit with f32 moments (docs/perf_notes.md)
— the near-full-HBM regime degraded to ~23 s/step.  ``table_opt_dtype:
bfloat16`` halves moment storage (10.2 -> 7.65 GB total residency), which
should restore normal-throughput headroom.  This bench confirms on hardware.

Prints one JSON line.  Usage: python benchmarks/bench_40m_bf16_moments.py
[moment_dtype] (default bfloat16; pass float32 for the A side).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(moment_dtype: str = "bfloat16",
         vocab_per_feature: int = 2_500_000, n_sparse: int = 16,
         emb_dim: int = 32, batch_size: int = 4096):
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config
    from mmlrec_tpu.train import Trainer
    from mmlrec_tpu.train.sparse_embedding import (
        batch_dedup_metadata,
        init_sparse_adam,
    )

    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=emb_dim, n_sparse=n_sparse,
        n_dense=4, hidden=(256, 128), tower=(64,), gate=(64,),
        batch_size=batch_size, two_phase_embedding=True,
        table_update="scatter",  # measure the scatter path (default is now auto->pallas)
        table_opt_dtype=moment_dtype,
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
    trainer.variables = trainer._init_variables(
        np.asarray(ids[:2]), np.asarray(dense[:2]))
    params = trainer.variables["params"]
    table = params["embeddings"]["fused"]["table"]
    state = {
        "params": params,
        "batch_stats": trainer.variables.get("batch_stats", {}),
        "opt_state": trainer.tx.init(trainer._without_table(params)[0]),
        "rng": jax.random.PRNGKey(1),
        "table_opt": init_sparse_adam(table, dtype=moment_dtype),
    }
    offs = np.asarray(trainer._fused_offsets)[None, :]
    flat = (ids_np.astype(np.int64) + offs).reshape(1, -1)
    inv, rep = batch_dedup_metadata(flat)
    batch = (ids, dense, y, None, jnp.ones((batch_size,), jnp.float32),
             jnp.asarray(inv[0]), jnp.asarray(rep[0]))

    table_gb = table.size * table.dtype.itemsize / 1024**3
    mom_gb = 2 * state["table_opt"].mu.size * state["table_opt"].mu.dtype.itemsize / 1024**3
    print(f"table {table_gb:.2f} GB, moments {mom_gb:.2f} GB "
          f"({state['table_opt'].mu.dtype})", flush=True)

    step = trainer._make_train_step()

    def chain_sync(s):
        leaf = s["params"]["embeddings"]["fused"]["table"]
        return float(np.asarray(leaf[(0,) * leaf.ndim]))

    t0 = time.perf_counter()
    state, *_ = step(state, batch)
    chain_sync(state)
    print(f"compiled+first step in {time.perf_counter() - t0:.0f}s", flush=True)

    try:
        ms = jax.local_devices()[0].memory_stats()
        print(f"bytes_in_use {ms.get('bytes_in_use', 0)/1024**3:.2f} GB "
              f"/ limit {ms.get('bytes_limit', 0)/1024**3:.2f} GB", flush=True)
    except Exception as e:  # relay backends may not expose stats
        print(f"memory_stats unavailable: {e}", flush=True)

    iters = 10
    best = float("inf")
    for r in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, *_ = step(state, batch)
        chain_sync(state)
        dt = (time.perf_counter() - t0) / iters
        best = min(best, dt)
        print(f"round {r}: {dt*1e3:.1f} ms/step", flush=True)

    print(json.dumps({
        "metric": "40m_row_two_phase_step",
        "moment_dtype": moment_dtype,
        "total_vocab": vocab_per_feature * n_sparse,
        "table_gb": round(table_gb, 2),
        "moments_gb": round(mom_gb, 2),
        "ms_per_step": round(best * 1e3, 1),
        "examples_per_s": round(batch_size / best, 0),
    }), flush=True)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["bfloat16"]))
