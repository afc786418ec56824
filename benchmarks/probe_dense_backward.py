"""Decompose the flagship DENSE backward (~254 us) by param group.

After the MXU embedding cotangent, the scanned stage ladder still shows the
dense backward at ~254 us (V3ng - V2 in probe_flagship_stages.py --scan)
against a ~80 us flops bound.  This probe stop-gradients one param GROUP at
a time (embeddings always stopped, matching V3ng), so each variant removes
that group's dW einsums and the difference isolates its backward cost.

Scanned (16 iters/dispatch), donated, interleaved, chain-synced.
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
    groups = sorted(state0["params"].keys())
    print(f"# param groups: {groups}", file=sys.stderr, flush=True)

    def make_variant(stop_groups):
        def body(state, batch):
            def loss(p):
                p2 = {
                    k: (
                        jax.tree_util.tree_map(jax.lax.stop_gradient, v)
                        if k in stop_groups
                        else v
                    )
                    for k, v in p.items()
                }
                return trainer._loss_terms(
                    p2, state["batch_stats"], batch, state["rng"], True
                )

            (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(
                state["params"]
            )
            params = jax.tree_util.tree_map(
                lambda p, g: p - 1e-9 * g, state["params"], grads
            )
            return {**state, "params": params}

        def scanned(state):
            def f(s, _):
                return body(s, batch), ()
            state, _ = jax.lax.scan(f, state, None, length=SCAN)
            return state

        return jax.jit(scanned, donate_argnums=(0,))

    variants = {"none_stopped": make_variant(("embeddings",))}
    for g in groups:
        if g == "embeddings":
            continue
        variants[f"stop_{g}"] = make_variant(("embeddings", g))
    variants["all_stopped"] = make_variant(tuple(groups))

    def chain_sync(s):
        return float(np.asarray(s["params"]["out"]["bias"].ravel()[0]))

    states = {}
    for name, f in variants.items():
        s = jax.tree_util.tree_map(lambda a: a + 0, state0)
        s = f(s)
        s = f(s)
        chain_sync(s)
        states[name] = s

    best = {k: float("inf") for k in variants}
    iters = 24
    for _ in range(4):
        for name, f in variants.items():
            s = states[name]
            t0 = time.perf_counter()
            for _ in range(iters):
                s = f(s)
            chain_sync(s)
            best[name] = min(
                best[name], (time.perf_counter() - t0) / (iters * SCAN))
            states[name] = s

    out = {"metric": "flagship_dense_backward_split", "batch": B}
    for name in variants:
        out[f"{name}_us"] = round(best[name] * 1e6, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
