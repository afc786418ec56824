"""Probe: does rematerialization (jax.checkpoint) cut the flagship step's
HBM traffic and time?

step_cost_analysis.py pins the flagship MMoE step as HBM-bandwidth-bound:
459 MB accessed -> 560 us roofline, measured ~880 us, with compute 12x away
from its bound.  The dominant traffic the bf16-activation probe could NOT
remove is matmul outputs the backward pass re-reads (perf_notes.md).  Remat
attacks exactly that term: recompute the forward during the backward instead
of re-reading stored residuals from HBM, paying ~1.33x FLOPs (nearly free
here) for fewer bytes.

Measures the EXACT trainer step (same construction as step_cost_analysis.py)
in three variants, interleaved same-window, chain-synced:
  base        - shipped step
  remat       - _loss_terms wrapped in jax.checkpoint (save nothing)
  remat_dots  - policy=dots_saveable (save matmul outputs only)

Prints one JSON line with per-variant bytes-accessed, flops, us/step, and
the numeric drift vs base after one step (should be ~1e-6 rel; remat changes
fusion boundaries, not math).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 4096


def build(variant: str):
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import aliexpress_like_config, make_data
    from mmlrec_tpu.train import Trainer

    cfg = aliexpress_like_config("mmoe", batch_size=B)
    layout, x, y, _ = make_data(cfg, n=B, seed=0)
    model = get_model("mmoe", layout, cfg)
    trainer = Trainer(model, seed=0).compile()
    if variant != "base":
        orig = trainer._loss_terms
        policy = None
        if variant == "remat_dots":
            policy = jax.checkpoint_policies.dots_saveable
        trainer._loss_terms = jax.checkpoint(
            orig, static_argnums=(4,), policy=policy
        )
    ids_np, dense_np = trainer.pack_inputs(x)
    y2 = trainer._prepare_y(y)
    dmask = trainer._domain_mask_from(x)
    batch = (
        jnp.asarray(ids_np), jnp.asarray(dense_np), jnp.asarray(y2),
        jnp.asarray(dmask) if dmask is not None else None,
        jnp.ones((B,), jnp.float32),
    )
    trainer.variables = trainer._init_variables(ids_np[:2], dense_np[:2])
    state = {
        "params": trainer.variables["params"],
        "batch_stats": trainer.variables.get("batch_stats", {}),
        "opt_state": trainer.tx.init(trainer.variables["params"]),
        "rng": jax.random.PRNGKey(1),
    }
    step_fn = jax.jit(trainer._step_body)
    compiled = step_fn.lower(state, batch).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return step_fn, state, batch, float(ca.get("flops", 0)), float(
        ca.get("bytes accessed", 0))


def main():
    # remat_dots' compiled cost analysis (bytes 741 MB vs base 481 MB) is
    # already worse than plain remat's 709 MB; skip its compile by default.
    variants = ["base", "remat"]
    if "--dots" in sys.argv:
        variants.append("remat_dots")
    built = {}
    for v in variants:
        built[v] = build(v)
        print(f"# {v}: flops={built[v][3]/1e9:.2f}G bytes={built[v][4]/1e6:.1f}MB",
              file=sys.stderr, flush=True)

    def chain_sync(s):
        return float(np.asarray(s["params"]["out"]["bias"].ravel()[0]))

    # numeric drift vs base after one step from identical state
    drift = {}
    ref_state = None
    for v in variants:
        step_fn, state, batch, _, _ = built[v]
        s1, *_ = step_fn(state, batch)
        leaf = np.asarray(s1["params"]["out"]["bias"])
        if v == "base":
            ref_state = leaf
        else:
            drift[v] = float(np.max(np.abs(leaf - ref_state)))

    # warm + interleaved timing
    states = {}
    for v in variants:
        step_fn, state, batch, _, _ = built[v]
        for _ in range(3):
            state, *_ = step_fn(state, batch)
        chain_sync(state)
        states[v] = state

    iters, rounds = 200, 5
    best = {v: float("inf") for v in variants}
    for _ in range(rounds):
        for v in variants:
            step_fn, _, batch, _, _ = built[v]
            s = states[v]
            t0 = time.perf_counter()
            for _ in range(iters):
                s, *_ = step_fn(s, batch)
            chain_sync(s)
            best[v] = min(best[v], (time.perf_counter() - t0) / iters)
            states[v] = s

    out = {"metric": "remat_flagship_probe", "batch": B}
    for v in variants:
        out[f"{v}_us"] = round(best[v] * 1e6, 1)
        out[f"{v}_mb"] = round(built[v][4] / 1e6, 1)
        out[f"{v}_gflop"] = round(built[v][3] / 1e9, 2)
    for v, d in drift.items():
        out[f"{v}_drift"] = d
    out["speedup_remat"] = round(best["base"] / best["remat"], 3)
    if "remat_dots" in variants:
        out["speedup_dots"] = round(best["base"] / best["remat_dots"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
