"""Flagship step time vs batch size: fixed overhead vs B-proportional cost.

The roofline study (step_cost_analysis.py) shows the B=4096 flagship step
is HBM-bound at ~560 us with ~320 us of residual.  If the residual is a
fixed per-step cost, larger batches amortize it and single-chip throughput
keeps climbing; if it scales with B, 4096 is already representative.  This
sweeps B and fits time(B) = a + b*B.  Chain-synced, best-of-N per size.
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = (1024, 2048, 4096, 8192, 16384)


def main():
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import aliexpress_like_config, make_data
    from mmlrec_tpu.train import Trainer

    steps = {}
    states = {}
    batches = {}
    for bs in BATCHES:
        cfg = aliexpress_like_config("mmoe", batch_size=bs)
        layout, x, y, _ = make_data(cfg, n=bs, seed=0)
        model = get_model("mmoe", layout, cfg)
        tr = Trainer(model, seed=0).compile()
        ids_np, dense_np = tr.pack_inputs(x)
        y2 = tr._prepare_y(y)
        dmask = tr._domain_mask_from(x)
        batches[bs] = (
            jnp.asarray(ids_np), jnp.asarray(dense_np), jnp.asarray(y2),
            jnp.asarray(dmask) if dmask is not None else None,
            jnp.ones((bs,), jnp.float32),
        )
        tr.variables = tr._init_variables(ids_np[:2], dense_np[:2])
        states[bs] = {
            "params": tr.variables["params"],
            "batch_stats": tr.variables.get("batch_stats", {}),
            "opt_state": tr.tx.init(tr.variables["params"]),
            "rng": jax.random.PRNGKey(1),
        }
        steps[bs] = jax.jit(tr._step_body)

    def chain_sync(s):
        return float(np.asarray(s["params"]["out"]["bias"])[0])

    # compile all first
    for bs in BATCHES:
        states[bs], *_ = steps[bs](states[bs], batches[bs])
        chain_sync(states[bs])

    iters, rounds = 200, 4
    best = {bs: float("inf") for bs in BATCHES}
    for _ in range(rounds):
        for bs in BATCHES:  # interleaved so window drift hits all sizes
            s = states[bs]
            t0 = time.perf_counter()
            for _ in range(iters):
                s, *_ = steps[bs](s, batches[bs])
            chain_sync(s)
            best[bs] = min(best[bs], (time.perf_counter() - t0) / iters)
            states[bs] = s

    xs = np.asarray(BATCHES, np.float64)
    ys = np.asarray([best[bs] * 1e6 for bs in BATCHES])
    b, a = np.polyfit(xs, ys, 1)  # us = a + b*B
    print(json.dumps({
        "metric": "flagship_batch_scaling",
        "us_per_step": {str(bs): round(best[bs] * 1e6, 1) for bs in BATCHES},
        "examples_per_s": {str(bs): round(bs / best[bs], 0) for bs in BATCHES},
        "fixed_us": round(float(a), 1),
        "us_per_example": round(float(b), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
