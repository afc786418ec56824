"""Probe: do END-TO-END bf16 activations beat f32 on the flagship step?

benchmarks/step_cost_analysis.py shows the flagship MMoE step is
HBM-bandwidth-bound (roofline 560 us of its measured ~870 us is HBM traffic;
compute bound is only ~47 us).  The round-1 bf16 probe cast matmul OPERANDS
only — activations stayed f32, so traffic was unchanged and the casts made
it slower.  This probe keeps activations bf16 end-to-end (params f32 master,
kernels cast at use, loss/update math f32), halving the dominant activation
traffic.  Interleaved A/B, chain-synced.  One JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, NS, ND, D = 4096, 16, 61, 8
VOCAB = 100
IN = NS * D + ND  # 189
E, H1, H2, G, TW = 4, 256, 128, 64, 64
T = 2  # tasks/domains


def make_params(rng):
    import jax.numpy as jnp
    k = {}
    k["emb"] = jnp.asarray(rng.normal(0, 1e-4, (NS * VOCAB, D)), jnp.float32)
    k["w1"] = jnp.asarray(rng.normal(0, 0.05, (E, IN, H1)), jnp.float32)
    k["w2"] = jnp.asarray(rng.normal(0, 0.05, (E, H1, H2)), jnp.float32)
    k["g1"] = jnp.asarray(rng.normal(0, 0.05, (T, IN, G)), jnp.float32)
    k["g2"] = jnp.asarray(rng.normal(0, 0.05, (T, G, E)), jnp.float32)
    k["t1"] = jnp.asarray(rng.normal(0, 0.05, (T, H2, TW)), jnp.float32)
    k["t2"] = jnp.asarray(rng.normal(0, 0.05, (T, TW, 1)), jnp.float32)
    return k


def make_step(dtype_name):
    import jax
    import jax.numpy as jnp

    act = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32

    def fwd(p, ids, dense, y):
        from mmlrec_tpu.ops.embedding import take_rows_matmul_grad

        c = lambda w: w.astype(act)
        # matmul cotangent (round 2): without it the step is dominated by
        # the embedding scatter-add and activation dtype is invisible
        ids_local = ids - jnp.arange(NS, dtype=ids.dtype)[None, :] * VOCAB
        rows = take_rows_matmul_grad(
            p["emb"], ids_local, (VOCAB,) * NS, VOCAB
        )
        x = jnp.concatenate(
            [rows.reshape(B, NS * D), dense], axis=1
        ).astype(act)
        h = jax.nn.relu(jnp.einsum("bi,eih->beh", x, c(p["w1"])))
        h = jax.nn.relu(jnp.einsum("beh,eho->beo", h, c(p["w2"])))  # [B,E,H2]
        g = jax.nn.relu(jnp.einsum("bi,tig->btg", x, c(p["g1"])))
        g = jax.nn.softmax(jnp.einsum("btg,tge->bte", g, c(p["g2"])), axis=-1)
        mix = jnp.einsum("bte,beo->bto", g, h)  # [B,T,H2]
        tw = jax.nn.relu(jnp.einsum("bto,tow->btw", mix, c(p["t1"])))
        logit = jnp.einsum("btw,two->bto", tw, c(p["t2"]))[..., 0]  # [B,T]
        # loss math in f32
        lf = logit.astype(jnp.float32)
        return jnp.sum(
            jnp.maximum(lf, 0) - lf * y + jnp.log1p(jnp.exp(-jnp.abs(lf)))
        )

    def step1(p, ids, dense, y):
        loss, g = jax.value_and_grad(fwd)(p, ids, dense, y)
        p = jax.tree_util.tree_map(lambda w, gw: w - 1e-3 * gw, p, g)
        return p, loss

    # scan16 like the shipped fit path (chained dispatches are limited by
    # the 0.4-1.1 ms per-dispatch floor post round 2)
    def step(p, ids, dense, y):
        def body(pp, _):
            pp, loss = step1(pp, ids, dense, y)
            return pp, loss
        p, losses = jax.lax.scan(body, p, None, length=16)
        return p, losses[-1]

    return jax.jit(step, donate_argnums=(0,))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, VOCAB, (B, NS)) + np.arange(NS)[None, :] * VOCAB, jnp.int32
    )
    dense = jnp.asarray(rng.random((B, ND)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (B, T)), jnp.float32)

    steps = {v: make_step(v) for v in ("f32", "bf16")}
    params = {v: make_params(np.random.default_rng(1)) for v in steps}

    def chain_sync(p):
        return float(np.asarray(p["t2"][(0, 0, 0)]))

    for v, s in steps.items():
        params[v], _ = s(params[v], ids, dense, y)
        chain_sync(params[v])

    iters, rounds = 24, 5  # x16 scanned steps per dispatch
    best = {v: float("inf") for v in steps}
    for _ in range(rounds):
        for v, s in steps.items():
            p = params[v]
            t0 = time.perf_counter()
            for _ in range(iters):
                p, _ = s(p, ids, dense, y)
            chain_sync(p)
            best[v] = min(best[v], (time.perf_counter() - t0) / (iters * 16))
            params[v] = p
    print(json.dumps({
        "metric": "bf16_activation_probe",
        "f32_us": round(best["f32"] * 1e6, 1),
        "bf16_us": round(best["bf16"] * 1e6, 1),
        "speedup": round(best["f32"] / best["bf16"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
