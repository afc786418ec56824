"""Flagship step time vs batch size (scan16, post round 2).

Round-1 ran this CHAINED and read a ~369 us "fixed term" — that was the
per-dispatch floor (max(floor, device time); probe_flagship_scan.py), not
in-program cost.  This version scans 16 steps per dispatch like the shipped
fit path, so the fit time(B) = a + b*B reflects true device cost.
Chain-synced, interleaved best-of-N per size.  Prints one JSON line.
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
        def _mk(tr=tr, batch_ref=bs):
            def body(s, _):
                new_state, *_ = tr._step_body(s, batches[batch_ref])
                return new_state, ()

            def step16(s, _b):
                s, _ = jax.lax.scan(body, s, None, length=16)
                return (s,)

            return jax.jit(step16, donate_argnums=(0,))

        steps[bs] = _mk()

    def chain_sync(s):
        return float(np.asarray(s["params"]["out"]["bias"])[0])

    # compile all first
    for bs in BATCHES:
        states[bs], *_ = steps[bs](states[bs], batches[bs])
        chain_sync(states[bs])

    iters, rounds = 24, 4  # x16 scanned steps per dispatch
    best = {bs: float("inf") for bs in BATCHES}
    for _ in range(rounds):
        for bs in BATCHES:  # interleaved so window drift hits all sizes
            s = states[bs]
            t0 = time.perf_counter()
            for _ in range(iters):
                s, *_ = steps[bs](s, batches[bs])
            chain_sync(s)
            best[bs] = min(best[bs], (time.perf_counter() - t0) / (iters * 16))
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
