"""Stage-removed decomposition of the FLAGSHIP train step.

batch_scaling.py fits the flagship step as ~369 us fixed + 0.178 us/example
— the fixed term is the entire gap to the HBM roofline (step_cost_analysis).
This probe locates it: donated full-state-shaped programs with stages
removed, measured same-window at TWO batch sizes so batch-independent
components stand out.

  V0  noop state->state (per-dispatch floor at flagship state size)
  V1  + forward (model.apply)
  V2  + loss + L2 reg (_loss_terms)
  V3  + backward (value_and_grad; params -= 1e-9 * grads, no optimizer)
  V4  the shipped step (_step_body: adam via optax.flatten, rng split, BN)

All variants fold their result into the params so nothing is DCE'd, keep
the state pytree structure identical, and are chained iters times with a
dependency-chained scalar readback (CLAUDE.md measurement rules).
One JSON line: per-variant us/step at each batch size.

--scan runs every variant body inside a 16-iteration lax.scan instead of
chained dispatches.  probe_flagship_scan.py showed chained-dispatch time is
max(per-dispatch floor, device time) — the floor fluctuates 0.4-1.1 ms
between windows and CONFOUNDS chained stage increments; under scan the
floor amortizes to ~6 us/step, so scanned increments are true device time.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = (1024, 4096)


def build(batch_size: int):
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

    def fold(state, scalar):
        params = dict(state["params"])
        out = dict(params["out"])
        out["bias"] = out["bias"] + 1e-12 * scalar
        params["out"] = out
        return {**state, "params": params}

    def v0(state, batch):
        return fold(state, batch[2][0, 0])

    def v1(state, batch):
        ids, dense, y, dmask_b, w = batch
        variables = {"params": state["params"]}
        if state["batch_stats"]:
            variables["batch_stats"] = state["batch_stats"]
        probs, _ = trainer.model.apply(
            variables, ids, dense, None, train=True,
            mutable=["batch_stats"], rngs={"dropout": state["rng"]},
        )
        return fold(state, jnp.sum(probs))

    def v2(state, batch):
        total, (dl, ns, pr) = trainer._loss_terms(
            state["params"], state["batch_stats"], batch, state["rng"], True
        )
        return fold(state, total)

    def v3(state, batch):
        (total, aux), grads = jax.value_and_grad(
            trainer._loss_terms, has_aux=True
        )(state["params"], state["batch_stats"], batch, state["rng"], True)
        params = jax.tree_util.tree_map(
            lambda p, g: p - 1e-9 * g, state["params"], grads
        )
        return {**state, "params": params}

    def v3ng(state, batch):
        # backward WITHOUT the embedding-table cotangent: stop_gradient on
        # the embedding params disconnects the [V, D] scatter-add from the
        # grad graph while every dense-layer grad still flows.
        def loss(p):
            p2 = dict(p)
            p2["embeddings"] = jax.tree_util.tree_map(
                jax.lax.stop_gradient, p["embeddings"]
            )
            total, aux = trainer._loss_terms(
                p2, state["batch_stats"], batch, state["rng"], True
            )
            return total, aux

        (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(
            state["params"]
        )
        params = jax.tree_util.tree_map(
            lambda p, g: p - 1e-9 * g, state["params"], grads
        )
        return {**state, "params": params}

    def v4(state, batch):
        new_state, *_ = trainer._step_body(state, batch)
        return new_state

    scan_n = 16 if "--scan" in sys.argv else 0

    def wrap(f):
        if not scan_n:
            return jax.jit(f, donate_argnums=(0,))

        def scanned(state, batch):
            def body(s, _):
                return f(s, batch), ()
            state, _ = jax.lax.scan(body, state, None, length=scan_n)
            return state

        return jax.jit(scanned, donate_argnums=(0,))

    fns = {}
    for name, f in (("V0", v0), ("V1", v1), ("V2", v2), ("V3", v3),
                    ("V3ng", v3ng), ("V4", v4)):
        fns[name] = wrap(f)
    return fns, state, batch, max(scan_n, 1)


def main():
    import jax

    out = {"metric": "flagship_stage_decomposition",
           "mode": "scan16" if "--scan" in sys.argv else "chained"}
    batches = (4096,) if "--scan" in sys.argv else BATCHES
    for bsz in batches:
        fns, state0, batch, per = build(bsz)

        def chain_sync(s):
            return float(np.asarray(s["params"]["out"]["bias"].ravel()[0]))

        states = {}
        for name, f in fns.items():
            s = jax.tree_util.tree_map(lambda a: a + 0 if hasattr(a, "shape") else a, state0)
            s = f(s, batch)
            s = f(s, batch)
            chain_sync(s)
            states[name] = s

        steps, rounds = 384, 4
        iters = max(steps // per, 1)
        best = {k: float("inf") for k in fns}
        for _ in range(rounds):
            for name, f in fns.items():
                s = states[name]
                t0 = time.perf_counter()
                for _ in range(iters):
                    s = f(s, batch)
                chain_sync(s)
                best[name] = min(
                    best[name], (time.perf_counter() - t0) / (iters * per))
                states[name] = s
        for name in fns:
            out[f"{name}_B{bsz}_us"] = round(best[name] * 1e6, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
