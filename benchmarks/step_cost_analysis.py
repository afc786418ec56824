"""Speed-of-light analysis of the flagship train step.

Uses XLA's compiled cost analysis (flops + bytes accessed) of the EXACT
flagship program bench.py times, and compares the roofline bounds against
the measured step time — quantifying how much of the step is fundamental
compute/bandwidth and how much is dispatch/runtime overhead on this
backend.  Prints one JSON line.

v5e peaks used: 197 TFLOP/s bf16 MXU (XLA runs f32 matmuls as bf16x3
passes by default -> effective f32 peak ~1/3 of that), 819 GB/s HBM.
"""
from __future__ import annotations

import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_FLOPS = 197e12
PEAK_HBM_GBS = 819e9


def main(batch_size: int = 4096):
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import aliexpress_like_config, make_data
    from mmlrec_tpu.train import Trainer

    cfg = aliexpress_like_config("mmoe", batch_size=batch_size)
    layout, x, y, _ = make_data(cfg, n=batch_size, seed=0)
    model = get_model("mmoe", layout, cfg)
    trainer = Trainer(model, seed=0).compile()
    ids_np, dense_np = trainer.pack_inputs(x)
    y2 = trainer._prepare_y(y)
    dmask = trainer._domain_mask_from(x)
    batch = (
        jnp.asarray(ids_np), jnp.asarray(dense_np), jnp.asarray(y2),
        jnp.asarray(dmask) if dmask is not None else None,
        jnp.ones((batch_size,), jnp.float32),
    )
    trainer.variables = trainer._init_variables(ids_np[:2], dense_np[:2])
    state = {
        "params": trainer.variables["params"],
        "batch_stats": trainer.variables.get("batch_stats", {}),
        "opt_state": trainer.tx.init(trainer.variables["params"]),
        "rng": jax.random.PRNGKey(1),
    }
    # the shipped fit() fast path: 16 steps per dispatch via lax.scan
    # (chained dispatches are limited by the 0.4-1.1 ms window-dependent
    # per-dispatch floor; docs/perf_notes.md "Flagship backward")
    SCAN = 16

    def scan_body(s, _):
        new_state, *_ = trainer._step_body(s, batch)
        return new_state, ()

    def step16(s):
        s, _ = jax.lax.scan(scan_body, s, None, length=SCAN)
        return s

    step_fn = jax.jit(step16, donate_argnums=(0,))
    lowered = step_fn.lower(state)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    # XLA's cost analysis counts a while-loop body ONCE (it does not
    # multiply by the trip count), so the scanned program's numbers ARE the
    # per-step numbers (verified: they match the chained single-step
    # program's 9.16 GFLOP / 481 MB).
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    # measured step time, chain-synced (same protocol as bench.py)
    def chain_sync(s):
        return float(np.asarray(s["params"]["out"]["bias"])[0])

    for _ in range(3):
        state = step_fn(state)
    chain_sync(state)
    t0 = time.perf_counter()
    chain_sync(state)
    sync_overhead = time.perf_counter() - t0
    iters = 24
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step_fn(state)
        chain_sync(state)
        best = min(best, max(time.perf_counter() - t0 - sync_overhead, 1e-9))
    measured_us = best / (iters * SCAN) * 1e6

    compute_us = flops / PEAK_BF16_FLOPS * 1e6
    hbm_us = bytes_acc / PEAK_HBM_GBS * 1e6
    bound_us = max(compute_us, hbm_us)
    print(json.dumps({
        "metric": "flagship_step_roofline",
        "flops_per_step": flops,
        "bytes_accessed": bytes_acc,
        "compute_bound_us": round(compute_us, 1),
        "hbm_bound_us": round(hbm_us, 1),
        "roofline_us": round(bound_us, 1),
        "measured_us": round(measured_us, 1),
        "pct_of_roofline": round(100 * bound_us / measured_us, 1),
        "arithmetic_intensity": round(flops / max(bytes_acc, 1), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
