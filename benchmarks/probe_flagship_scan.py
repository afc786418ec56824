"""Does scanning N flagship steps per dispatch amortize the ~417 us floor?

probe_flagship_stages.py measured a NO-OP donated state->state program at
~417 us/dispatch at flagship state size (B=4096 group), which matches
batch_scaling.py's ~369 us fixed term — i.e. the entire measured gap to the
HBM roofline (903 us step vs ~487 us in-program increment) is the
PER-DISPATCH floor, not sub-peak gather/scatter.  The 40M path already
amortizes its (much larger, ~6.3 ms at 10 GB state) floor with scan_steps.
CLAUDE.md records an earlier flagship finding that "scan and chained run at
the SAME true speed"; this probe retests it with the stage-probe discipline:
same window, interleaved, donated, chain-synced, per-step normalized.

Variants: full step chained / full step scan16 / noop chained / noop scan16.
One JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 4096
SCAN = 16


def main():
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import aliexpress_like_config, make_data
    from mmlrec_tpu.train import Trainer

    cfg = aliexpress_like_config("mmoe", batch_size=B)
    layout, x, y, _ = make_data(cfg, n=B, seed=0)
    model = get_model("mmoe", layout, cfg)
    trainer = Trainer(model, seed=0).compile()
    ids_np, dense_np = trainer.pack_inputs(x)
    y2 = trainer._prepare_y(y)
    dmask = trainer._domain_mask_from(x)
    batch = (
        jnp.asarray(ids_np), jnp.asarray(dense_np), jnp.asarray(y2),
        jnp.asarray(dmask) if dmask is not None else None,
        jnp.ones((B,), jnp.float32),
    )
    trainer.variables = trainer._init_variables(ids_np[:2], dense_np[:2])
    state0 = {
        "params": trainer.variables["params"],
        "batch_stats": trainer.variables.get("batch_stats", {}),
        "opt_state": trainer.tx.init(trainer.variables["params"]),
        "rng": jax.random.PRNGKey(1),
    }

    def fold(state, scalar):
        params = dict(state["params"])
        out = dict(params["out"])
        out["bias"] = out["bias"] + 1e-12 * scalar
        params["out"] = out
        return {**state, "params": params}

    def step1(state, batch):
        new_state, *_ = trainer._step_body(state, batch)
        return new_state

    def noop1(state, batch):
        return fold(state, batch[2][0, 0])

    def scanned(body):
        def run(state, batch):
            def f(s, _):
                return body(s, batch), ()
            state, _ = jax.lax.scan(f, state, None, length=SCAN)
            return state
        return run

    fns = {
        "step_chain": (jax.jit(step1, donate_argnums=(0,)), 1),
        "step_scan16": (jax.jit(scanned(step1), donate_argnums=(0,)), SCAN),
        "noop_chain": (jax.jit(noop1, donate_argnums=(0,)), 1),
        "noop_scan16": (jax.jit(scanned(noop1), donate_argnums=(0,)), SCAN),
    }

    def chain_sync(s):
        return float(np.asarray(s["params"]["out"]["bias"].ravel()[0]))

    states = {}
    for name, (f, _) in fns.items():
        s = jax.tree_util.tree_map(lambda a: a + 0, state0)
        s = f(s, batch)
        s = f(s, batch)
        chain_sync(s)
        states[name] = s

    STEPS = 384  # per-variant true steps per round
    best = {k: float("inf") for k in fns}
    for _ in range(5):
        for name, (f, per) in fns.items():
            s = states[name]
            iters = STEPS // per
            t0 = time.perf_counter()
            for _ in range(iters):
                s = f(s, batch)
            chain_sync(s)
            best[name] = min(
                best[name], (time.perf_counter() - t0) / (iters * per))
            states[name] = s

    out = {"metric": "flagship_scan_probe", "batch": B, "scan": SCAN}
    for name in fns:
        out[f"{name}_us"] = round(best[name] * 1e6, 1)
    out["speedup_scan"] = round(best["step_chain"] / best["step_scan16"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
