"""Probe: does optax.flatten (one fused vector update for all params)
shave the ~369 us fixed per-step cost of the flagship step?

batch_scaling.py shows the flagship step carries ~369 us of B-independent
cost.  One candidate component is the per-tensor kernel fan-out of the
optimizer: adam over ~40 separate parameter leaves emits ~40 small
elementwise kernel groups per step.  optax.flatten ravels all leaves into
one vector so moments/updates are single large elementwise ops.
Interleaved A/B on the exact flagship step, chain-synced.  One JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(flat: bool):
    import jax
    import jax.numpy as jnp
    import optax

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import aliexpress_like_config, make_data
    from mmlrec_tpu.train import Trainer

    bs = 4096
    cfg = aliexpress_like_config("mmoe", batch_size=bs)
    layout, x, y, _ = make_data(cfg, n=bs, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    if flat:
        tr.tx = optax.flatten(tr.tx)
    ids_np, dense_np = tr.pack_inputs(x)
    y2 = tr._prepare_y(y)
    dmask = tr._domain_mask_from(x)
    batch = (
        jnp.asarray(ids_np), jnp.asarray(dense_np), jnp.asarray(y2),
        jnp.asarray(dmask) if dmask is not None else None,
        jnp.ones((bs,), jnp.float32),
    )
    tr.variables = tr._init_variables(ids_np[:2], dense_np[:2])
    state = {
        "params": tr.variables["params"],
        "batch_stats": tr.variables.get("batch_stats", {}),
        "opt_state": tr.tx.init(tr.variables["params"]),
        "rng": jax.random.PRNGKey(1),
    }
    return jax.jit(tr._step_body), state, batch


def main():
    variants = {}
    for name, flat in (("plain", False), ("flat", True)):
        variants[name] = build(flat)

    def chain_sync(s):
        return float(np.asarray(s["params"]["out"]["bias"])[0])

    for name, (step, state, batch) in variants.items():
        state, *_ = step(state, batch)
        chain_sync(state)
        variants[name] = (step, state, batch)

    iters, rounds = 200, 5
    best = {n: float("inf") for n in variants}
    for _ in range(rounds):
        for name in variants:
            step, state, batch = variants[name]
            t0 = time.perf_counter()
            for _ in range(iters):
                state, *_ = step(state, batch)
            chain_sync(state)
            best[name] = min(best[name], (time.perf_counter() - t0) / iters)
            variants[name] = (step, state, batch)
    print(json.dumps({
        "metric": "flat_optimizer_probe",
        "plain_us": round(best["plain"] * 1e6, 1),
        "flat_us": round(best["flat"] * 1e6, 1),
        "speedup": round(best["plain"] / best["flat"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
