"""Interleaved A/B/C of fused-embedding train-step variants at large vocab.

Variants: ``packed`` (lane-packed table + dense adam), ``plain`` (plain table
+ dense adam), ``twophase`` (lane-packed + two-phase gathered-rows
differentiation + SparseAdam — no [V, D] cotangent).

Window-to-window TPU throughput varies 2-3x (docs/perf_notes.md), so a fair
comparison interleaves the variants in one process and compares per-round
pairs.  Each variant's program compiles once (jit cache).

Usage: python benchmarks/ab_packed_embedding.py [rounds] [variant,variant,...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# flax setup() re-runs on every trace, so the pack decision must stay stable
# for each variant's lifetime: route it through a mode flag.
_MODE = {"packed": True}


def _install_patch():
    import mmlrec_tpu.ops.embedding as E

    if getattr(E.pack_factor_for, "_ab_patched", False):
        return
    orig = E.pack_factor_for

    def patched(total, dim, **kw):
        return orig(total, dim, **kw) if _MODE["packed"] else 1

    patched._ab_patched = True
    E.pack_factor_for = patched


def make_step(variant: str, vocab_per_feature=1_000_000, n_sparse=10, emb_dim=32,
              batch_size=4096):
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config
    from mmlrec_tpu.train import Trainer

    _install_patch()
    packed = variant != "plain"
    _MODE["packed"] = packed
    # explicit scatter: the trainer default is now auto -> pallas on TPU,
    # which would change what this A/B measures
    extra = (
        {"two_phase_embedding": True, "table_update": "scatter"}
        if variant == "twophase"
        else {}
    )
    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=emb_dim, n_sparse=n_sparse,
        n_dense=4, hidden=(256, 128), tower=(64,), gate=(64,),
        batch_size=batch_size, **extra,
    )
    cols = [SparseFeat(f"s{i}", vocab_per_feature, emb_dim) for i in range(n_sparse)] + [
        DenseFeat(f"d{i}", 1) for i in range(4)
    ]
    layout = FeatureLayout(cols)
    model = get_model("mmoe", layout, cfg)
    trainer = Trainer(model, seed=0).compile(metrics=[])
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, vocab_per_feature, (batch_size, n_sparse)).astype(np.int32)
    ids = jnp.asarray(ids_np)
    dense = jnp.asarray(rng.random((batch_size, 4)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (batch_size, 2)), jnp.float32)
    batch = (ids, dense, y, None, jnp.ones((batch_size,), jnp.float32))
    trainer.variables = trainer._init_variables(
        np.asarray(ids[:2]), np.asarray(dense[:2]))
    params = trainer.variables["params"]
    tx_params = params
    if variant == "twophase":
        tx_params = trainer._without_table(params)[0]
    state = {
        "params": params,
        "batch_stats": trainer.variables.get("batch_stats", {}),
        "opt_state": trainer.tx.init(tx_params),
        "rng": jax.random.PRNGKey(1),
    }
    if variant == "twophase":
        from mmlrec_tpu.train.sparse_embedding import (
            batch_dedup_metadata,
            init_sparse_adam,
        )

        state["table_opt"] = init_sparse_adam(params["embeddings"]["fused"]["table"])
        offs = np.asarray(trainer._fused_offsets)[None, :]
        flat = (ids_np.astype(np.int64) + offs).reshape(1, -1)
        inv, rep = batch_dedup_metadata(flat)
        batch = batch + (jnp.asarray(inv[0]), jnp.asarray(rep[0]))
    step = trainer._make_train_step()

    def chain_sync(s):
        leaf = jax.tree_util.tree_leaves(s["params"])[0]
        # scalar-index on device: np.asarray(whole leaf) downloads GBs through
        # the relay, and .ravel() materializes an on-device copy
        return float(np.asarray(leaf[(0,) * leaf.ndim]))

    def run(iters=10):
        nonlocal state
        _MODE["packed"] = packed  # keep any retrace consistent with this variant
        t0 = time.perf_counter()
        for _ in range(iters):
            state, *_ = step(state, batch)
        chain_sync(state)
        return (time.perf_counter() - t0) / iters

    return run


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    variants = (sys.argv[2].split(",") if len(sys.argv) > 2
                else ["packed", "plain"])
    t0 = time.time()
    runs = {}
    for v in variants:
        print(f"compiling {v}...", flush=True)
        runs[v] = make_step(v)
        runs[v](1)
        print(f"{v} compiled [{time.time()-t0:.0f}s]", flush=True)
    best = {v: float("inf") for v in variants}
    for r in range(rounds):
        line = f"round {r}:"
        for v in variants:
            t = runs[v]()
            best[v] = min(best[v], t)
            line += f"  {v} {t*1e3:9.1f} ms"
        print(line + f"  [{time.time()-t0:.0f}s]", flush=True)
    print("BEST: " + "  ".join(f"{v} {best[v]*1e3:.1f} ms" for v in variants),
          flush=True)


if __name__ == "__main__":
    main()
