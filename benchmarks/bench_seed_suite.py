"""Vmapped 4-seed concurrent training vs sequential: suite speedup.

The reference protocol trains seeds {0,2,4,8} one after another
(reference main.py:85-89).  train/multi_seed.py vmaps the whole train
step over the seed axis.  This measures the per-step cost of the vmapped
4-seed program vs 4x the solo step on the flagship MMoE/AliExpress-MSL
shapes — suite_speedup = 4 * solo / vmapped.  Chain-synced, interleaved
best-of-N.  One JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = (0, 2, 4, 8)
BATCH = 4096


def main():
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import aliexpress_like_config, make_data
    from mmlrec_tpu.train import SeedSuiteTrainer, Trainer

    cfg = aliexpress_like_config("mmoe", batch_size=BATCH)
    layout, x, y, _ = make_data(cfg, n=BATCH * 2, seed=0)
    model = get_model("mmoe", layout, cfg)

    # ---- solo step -------------------------------------------------------
    tr = Trainer(model, seed=0).compile()
    ids_np, dense_np = tr.pack_inputs(x)
    y2 = tr._prepare_y(y)
    dmask = tr._domain_mask_from(x)
    staged = tr._stage_dataset(ids_np, dense_np, y2, dmask)
    n = len(ids_np)
    steps = n // BATCH
    idx2d = jnp.asarray(
        np.random.default_rng(0).permutation(n)[: steps * BATCH]
        .reshape(steps, BATCH).astype(np.int32)
    )
    w2d = jnp.ones((steps, BATCH), jnp.float32)
    tr.variables = tr._init_variables(ids_np[:2], dense_np[:2])
    solo_state = {
        "params": tr.variables["params"],
        "batch_stats": tr.variables.get("batch_stats", {}),
        "opt_state": tr.tx.init(tr.variables["params"]),
        "rng": jax.random.PRNGKey(1),
        "epoch_step": jnp.zeros((), jnp.int32),
    }
    solo_step = tr._make_gather_step()

    # ---- vmapped suite step ---------------------------------------------
    suite = SeedSuiteTrainer(model, seeds=SEEDS).compile()
    # _split_staged needs the stage dims recorded on the suite's trainer
    suite.tr._stage_dataset(ids_np, dense_np, y2, dmask)
    S = len(SEEDS)
    variables = suite._stacked_init(ids_np[:2], dense_np[:2])
    suite_state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": jax.vmap(tr.tx.init)(variables["params"]),
        "rng": jnp.stack([jax.random.PRNGKey(s + 1) for s in SEEDS]),
        "epoch_step": jnp.zeros((S,), jnp.int32),
    }
    idx3 = jnp.broadcast_to(idx2d[None], (S,) + idx2d.shape)
    vstep = suite._make_vstep(steps)

    def sync_solo(s):
        return float(np.asarray(s["params"]["out"]["bias"])[0])

    def sync_suite(s):
        return float(np.asarray(s["params"]["out"]["bias"])[(0, 0)])

    solo_state, *_ = solo_step(solo_state, staged, idx2d, w2d)
    sync_solo(solo_state)
    suite_state, *_ = vstep(suite_state, idx3, w2d, staged)
    sync_suite(suite_state)

    iters, rounds = 200, 5
    best = {"solo": float("inf"), "suite": float("inf")}
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            solo_state, *_ = solo_step(solo_state, staged, idx2d, w2d)
        sync_solo(solo_state)
        best["solo"] = min(best["solo"], (time.perf_counter() - t0) / iters)
        t0 = time.perf_counter()
        for _ in range(iters):
            suite_state, *_ = vstep(suite_state, idx3, w2d, staged)
        sync_suite(suite_state)
        best["suite"] = min(best["suite"], (time.perf_counter() - t0) / iters)

    print(json.dumps({
        "metric": "vmapped_seed_suite",
        "seeds": S,
        "solo_us": round(best["solo"] * 1e6, 1),
        "suite_us": round(best["suite"] * 1e6, 1),
        "suite_speedup_vs_sequential": round(S * best["solo"] / best["suite"], 2),
        "suite_examples_per_s": round(S * BATCH / best["suite"], 0),
    }), flush=True)


if __name__ == "__main__":
    main()
