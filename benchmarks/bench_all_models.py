"""Per-model training throughput on AliExpress-MSL shapes (one JSON line per
model; full jitted train step, 16 steps per dispatch via lax.scan — the
shipped fit() fast path.  Chained single-step dispatches are limited by the
0.4-1.1 ms window-dependent per-dispatch floor, which post-round-2 exceeds
most models' device time; see docs/perf_notes.md "Flagship backward")."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_model(name: str, batch_size: int = 4096, iters: int = 200):
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import aliexpress_like_config, make_data
    from mmlrec_tpu.train import Trainer

    kw = {}
    if name in ("aitm", "esmm", "escm"):
        # 2-task families: run MTL (AITM/ESMM hard-require 2 tasks)
        cfg = aliexpress_like_config(name, task_name="mtl", num_tasks=2, **kw)
    else:
        cfg = aliexpress_like_config(name, **kw)
    layout, x, y, _ = make_data(cfg, n=batch_size, seed=0)
    model = get_model(name, layout, cfg)
    trainer = Trainer(model, seed=0).compile()
    ids_np, dense_np = trainer.pack_inputs(x)
    y2 = trainer._prepare_y(y)
    dmask = trainer._domain_mask_from(x)
    batch = (
        jnp.asarray(ids_np),
        jnp.asarray(dense_np),
        jnp.asarray(y2),
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
    SCAN = 16

    def scan_body(s, _):
        new_state, *_ = trainer._step_body(s, batch)
        return new_state, ()

    def _step16(s):
        s, _ = jax.lax.scan(scan_body, s, None, length=SCAN)
        return s

    step_fn = jax.jit(_step16, donate_argnums=(0,))

    def step(s, _b):
        return (step_fn(s),)

    def chain_sync(s):
        # block_until_ready does not reliably block on this backend
        # (docs/perf_notes.md) — force a dependency-chained host readback
        leaf = jax.tree_util.tree_leaves(s["params"])[0]
        # scalar-index on device: np.asarray(whole leaf) downloads GBs through
        # the relay, and .ravel() materializes an on-device copy
        return float(np.asarray(leaf[(0,) * leaf.ndim]))

    for _ in range(3):
        state, *_ = step(state, batch)
    chain_sync(state)
    # readback RTT on an already-synced state — must NOT include a dispatch
    # (a scanned dispatch is 16 steps of device work; subtracting it from a
    # 12-dispatch trial would inflate throughput ~9%)
    t0 = time.perf_counter()
    chain_sync(state)
    sync_overhead = time.perf_counter() - t0
    iters = max(iters // SCAN, 1)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, *_ = step(state, batch)
        chain_sync(state)
        best = min(best, max(time.perf_counter() - t0 - sync_overhead, 1e-9))
    return batch_size * iters * SCAN / best


def main():
    names = [
        "sharedbottom", "mlp", "mmoe", "hmoe", "ple", "cross_stitch", "esmm",
        "escm", "aitm", "snr_trans", "mssm", "star", "apg", "pepnet",
    ]
    results = {}
    for name in names:
        try:
            eps = bench_model(name)
            results[name] = round(eps, 0)
            print(json.dumps({"model": name, "examples_per_s": round(eps, 0)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"model": name, "error": str(e)[:200]}), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
