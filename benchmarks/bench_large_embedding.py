"""Production-scale embedding stress bench: train steps with a multi-GB
fused table (the reference tops out at a few thousand embedding rows; this
exercises the north-star 'sharded embedding store' sizing on one chip).

Prints one JSON line per configuration."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(vocab_per_feature: int, n_sparse: int, emb_dim: int,
          batch_size: int = 4096, iters: int = 200):
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.config import ExperimentConfig
    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config
    from mmlrec_tpu.train import Trainer

    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=emb_dim, n_sparse=n_sparse,
        n_dense=4, hidden=(256, 128), tower=(64,), gate=(64,),
        batch_size=batch_size,
    )
    cols = [SparseFeat(f"s{i}", vocab_per_feature, emb_dim) for i in range(n_sparse)] + [
        DenseFeat(f"d{i}", 1) for i in range(4)
    ]
    layout = FeatureLayout(cols)
    model = get_model("mmoe", layout, cfg)
    trainer = Trainer(model, seed=0).compile(metrics=[])

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, vocab_per_feature, (batch_size, n_sparse)),
                      jnp.int32)
    dense = jnp.asarray(rng.random((batch_size, 4)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (batch_size, 2)), jnp.float32)
    batch = (ids, dense, y, None, jnp.ones((batch_size,), jnp.float32))

    trainer.variables = trainer._init_variables(np.asarray(ids[:2]), np.asarray(dense[:2]))
    import jax

    table = trainer.variables["params"]["embeddings"]["fused"]["table"]
    table_gb = table.size * 4 / 1024**3
    state = {
        "params": trainer.variables["params"],
        "batch_stats": trainer.variables.get("batch_stats", {}),
        "opt_state": trainer.tx.init(trainer.variables["params"]),
        "rng": jax.random.PRNGKey(1),
    }
    step = trainer._make_train_step()

    def chain_sync(s):
        # block_until_ready is unreliable on this backend (docs/perf_notes.md)
        leaf = jax.tree_util.tree_leaves(s["params"])[0]
        # scalar-index on device: np.asarray(whole leaf) downloads GBs through
        # the relay, and .ravel() materializes an on-device copy
        return float(np.asarray(leaf[(0,) * leaf.ndim]))

    for _ in range(3):
        state, *_ = step(state, batch)
    chain_sync(state)
    # readback-only overhead (queue already drained)
    t0 = time.perf_counter()
    chain_sync(state)
    sync_overhead = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, *_ = step(state, batch)
        chain_sync(state)
        best = min(best, max(time.perf_counter() - t0 - sync_overhead, 1e-9))
    print(json.dumps({
        "total_vocab": vocab_per_feature * n_sparse,
        "emb_dim": emb_dim,
        "table_gb": round(table_gb, 2),
        "examples_per_s": round(batch_size * iters / best, 0),
        "us_per_step": round(best / iters * 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    # 1.6M rows x 16 -> 100k vocab/feature; then 10M and 40M total rows
    bench(100_000, 16, 16)     # 1.6M rows,  dim 16: 102 MB table
    bench(1_000_000, 10, 32)   # 10M rows,   dim 32: 1.28 GB table
    bench(2_500_000, 16, 32)   # 40M rows,   dim 32: 5.1 GB table
