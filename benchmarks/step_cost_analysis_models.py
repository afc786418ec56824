"""Per-model roofline audit of the training-step slow tail (VERDICT r3 #7).

The per-model throughput table (BASELINE.md) spans 6.1M (ple) to 30.1M
(sharedbottom) ex/s with no evidence whether the slow families are at
their bound or leaving 2x on the table.  This runs the flagship-shape XLA
cost analysis (step_cost_analysis.py method: compiled flops/bytes of the
EXACT scanned fit-path program + chain-synced measurement) for each
requested model family and prints one JSON line per model plus a summary
table.

Usage: python benchmarks/step_cost_analysis_models.py [model ...]
(default: sharedbottom mmoe ple mssm snr_trans).  SCAN_STEPS env (default
16) matches the shipped fit path.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_FLOPS = 197e12
PEAK_HBM_GBS = 819e9
SCAN = int(os.environ.get("SCAN_STEPS", "16"))


def analyze(model_name: str, batch_size: int = 4096):
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import aliexpress_like_config, make_data
    from mmlrec_tpu.train import Trainer

    cfg = aliexpress_like_config(model_name, batch_size=batch_size)
    layout, x, y, _ = make_data(cfg, n=batch_size, seed=0)
    model = get_model(model_name, layout, cfg)
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

    def scan_body(s, _):
        new_state, *_ = trainer._step_body(s, batch)
        return new_state, ()

    def stepN(s):
        s, _ = jax.lax.scan(scan_body, s, None, length=SCAN)
        return s

    step_fn = jax.jit(stepN, donate_argnums=(0,))
    t0 = time.perf_counter()
    compiled = step_fn.lower(state).compile()
    compile_s = time.perf_counter() - t0
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    def chain_sync(s):
        leaf = jax.tree_util.tree_leaves(s["params"])[0]
        return float(np.asarray(leaf.ravel()[0]))

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
    row = {
        "metric": "model_step_roofline",
        "model": model_name,
        "flops_per_step": flops,
        "mb_accessed": round(bytes_acc / 1e6, 1),
        "compute_bound_us": round(compute_us, 1),
        "hbm_bound_us": round(hbm_us, 1),
        "bound": "mxu" if compute_us > hbm_us else "hbm",
        "measured_us": round(measured_us, 1),
        "pct_of_roofline": round(100 * bound_us / measured_us, 1),
        "examples_per_s": round(batch_size / (measured_us / 1e6)),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(row), flush=True)
    del state, trainer
    return row


def main():
    models = sys.argv[1:] or ["sharedbottom", "mmoe", "ple", "mssm",
                              "snr_trans"]
    rows = []
    for m in models:
        try:
            rows.append(analyze(m))
        except Exception as e:
            print(json.dumps({"model": m,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
    print(f"{'model':14s} {'bound':4s} {'bound_us':>8s} {'meas_us':>8s} "
          f"{'%light':>6s} {'ex/s':>10s}")
    for r in rows:
        print(f"{r['model']:14s} {r['bound']:4s} "
              f"{max(r['compute_bound_us'], r['hbm_bound_us']):8.1f} "
              f"{r['measured_us']:8.1f} {r['pct_of_roofline']:6.1f} "
              f"{r['examples_per_s']:10d}")


if __name__ == "__main__":
    main()
