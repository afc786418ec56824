"""Interleaved A/B of lane-packed vs plain fused-embedding train steps.

Window-to-window TPU throughput varies 2-3x (docs/perf_notes.md), so a fair
comparison interleaves the two variants in one process: A B A B ... and
compares per-round pairs.  Each variant's program compiles once (jit cache).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_step(packed: bool, vocab_per_feature=1_000_000, n_sparse=10, emb_dim=32,
              batch_size=4096):
    import jax
    import jax.numpy as jnp

    import mmlrec_tpu.ops.embedding as E
    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config
    from mmlrec_tpu.train import Trainer

    orig = E.pack_factor_for
    if not packed:
        E.pack_factor_for = lambda *a, **k: 1
    try:
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
        ids = jnp.asarray(
            rng.integers(0, vocab_per_feature, (batch_size, n_sparse)), jnp.int32)
        dense = jnp.asarray(rng.random((batch_size, 4)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 2, (batch_size, 2)), jnp.float32)
        batch = (ids, dense, y, None, jnp.ones((batch_size,), jnp.float32))
        trainer.variables = trainer._init_variables(
            np.asarray(ids[:2]), np.asarray(dense[:2]))
        state = {
            "params": trainer.variables["params"],
            "batch_stats": trainer.variables.get("batch_stats", {}),
            "opt_state": trainer.tx.init(trainer.variables["params"]),
            "rng": jax.random.PRNGKey(1),
        }
        step = trainer._make_train_step()
    finally:
        E.pack_factor_for = orig

    def chain_sync(s):
        leaf = jax.tree_util.tree_leaves(s["params"])[0]
        return float(np.asarray(leaf).ravel()[0])

    def run(iters=10):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(iters):
            state, *_ = step(state, batch)
        chain_sync(state)
        return (time.perf_counter() - t0) / iters

    return run


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    t0 = time.time()
    print("compiling packed...", flush=True)
    run_a = make_step(True)
    run_a(1)
    print(f"packed compiled [{time.time()-t0:.0f}s]", flush=True)
    print("compiling plain...", flush=True)
    run_b = make_step(False)
    run_b(1)
    print(f"plain compiled [{time.time()-t0:.0f}s]", flush=True)
    best_a = best_b = float("inf")
    for r in range(rounds):
        a = run_a()
        b = run_b()
        best_a, best_b = min(best_a, a), min(best_b, b)
        print(f"round {r}: packed {a*1e3:9.1f} ms  plain {b*1e3:9.1f} ms  "
              f"(plain/packed {b/a:.2f}x)  [{time.time()-t0:.0f}s]", flush=True)
    print(f"BEST: packed {best_a*1e3:.1f} ms  plain {best_b*1e3:.1f} ms  "
          f"speedup {best_b/best_a:.2f}x", flush=True)


if __name__ == "__main__":
    main()
