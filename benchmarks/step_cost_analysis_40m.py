"""Speed-of-light analysis of the ROUND-3 40M x 32 two-phase step.

Same method as step_cost_analysis.py (XLA compiled cost analysis of the
exact scanned program + chain-synced measurement) applied to the
production-vocabulary step: stacked table+moment container, gather-route
dedup, pallas dual strided writes (BASELINE.md round-3 ladder, 4.2-4.3
ms/step measured).  Env knobs mirror bench_40m_table_update.py
(TABLE_CONTAINER / DEDUP_ROUTE / SCAN_STEPS / VOCAB_PER_FEATURE).

Prints one JSON line with flops / bytes / roofline bounds / light %.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_BF16_FLOPS = 197e12
PEAK_HBM_GBS = 819e9
SCAN = int(os.environ.get("SCAN_STEPS", "16"))
VOCAB = int(os.environ.get("VOCAB_PER_FEATURE", 2_500_000))


def main(n_sparse=16, emb_dim=32, batch_size=4096):
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config
    from mmlrec_tpu.train import Trainer
    from mmlrec_tpu.train.sparse_embedding import (
        SparseAdamFoldedState,
        init_sparse_adam,
    )

    kw = dict(
        task_name="mtl", model_name="mmoe", emb=emb_dim, n_sparse=n_sparse,
        n_dense=4, hidden=(256, 128), tower=(64,), gate=(64,),
        batch_size=batch_size, two_phase_embedding=True,
        table_update="pallas", table_opt_dtype="bfloat16",
        table_container=os.environ.get("TABLE_CONTAINER", "stacked"),
    )
    if os.environ.get("DEDUP_ROUTE"):
        kw["dedup_route"] = os.environ["DEDUP_ROUTE"]
    cfg = make_config(**kw)
    cols = [SparseFeat(f"s{i}", VOCAB, emb_dim) for i in range(n_sparse)] + [
        DenseFeat(f"d{i}", 1) for i in range(4)
    ]
    layout = FeatureLayout(cols)
    model = get_model("mmoe", layout, cfg)
    trainer = Trainer(model, seed=0).compile(metrics=[])

    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, VOCAB, (batch_size, n_sparse)).astype(np.int32)
    ids = jnp.asarray(ids_np)
    dense = jnp.asarray(rng.random((batch_size, 4)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (batch_size, 2)), jnp.float32)
    trainer.variables = trainer._init_variables(
        np.asarray(ids[:2]), np.asarray(dense[:2]))
    params = trainer.variables["params"]
    table = params["embeddings"]["fused"]["table"]
    stacked = trainer.table_container == "stacked"
    state = {
        "params": params,
        "batch_stats": trainer.variables.get("batch_stats", {}),
        "opt_state": trainer.tx.init(trainer._without_table(params)[0]),
        "rng": jax.random.PRNGKey(1),
        "table_opt": (
            SparseAdamFoldedState(count=jnp.zeros((), jnp.int32))
            if stacked
            else init_sparse_adam(table, dtype="bfloat16", packed=True)
        ),
    }
    offs = np.asarray(trainer._fused_offsets)[None, :]
    flat = (ids_np.astype(np.int64) + offs).reshape(1, -1)
    meta = trainer._step_metadata(flat)
    batch = (ids, dense, y, None, jnp.ones((batch_size,), jnp.float32),
             ) + tuple(jnp.asarray(a[0]) for a in meta)

    def scan_body(s, _):
        new_state, *_ = trainer._step_body(s, batch)
        return new_state, ()

    def stepN(s):
        s, _ = jax.lax.scan(scan_body, s, None, length=SCAN)
        return s

    step_fn = jax.jit(stepN, donate_argnums=(0,))
    t0 = time.perf_counter()
    compiled = step_fn.lower(state).compile()
    print(f"compiled in {time.perf_counter() - t0:.0f}s", flush=True)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    if os.environ.get("HLO_BUFFERS"):
        # tally the optimized (post-fusion) HLO's materialized buffers so
        # byte-reduction work targets real allocations, not guesses
        import collections
        import re

        txt = compiled.as_text()
        sizes = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "s8": 1,
                 "pred": 1, "f16": 2, "s64": 8, "u8": 1}
        tally = collections.Counter()
        for m in re.finditer(
            r"^\s*(?:ROOT\s+)?%?[\w.\-]+ = (\w+)\[([\d,]*)\][^=]*? (\w+)\(",
            txt, re.M,
        ):
            dt, shape, op = m.group(1), m.group(2), m.group(3)
            if op in ("parameter", "constant", "get-tuple-element",
                      "tuple", "bitcast"):
                continue
            if dt not in sizes or not shape:
                continue
            n = 1
            for d in shape.split(","):
                n *= int(d)
            b = n * sizes[dt]
            if b >= 8 << 20:  # >= 8 MB buffers only
                tally[f"{op} {dt}[{shape}]"] += b
        for k, b in tally.most_common(20):
            print(f"  {b/1e6:8.1f} MB  {k}")
        print(f"  (total tallied >=8MB: "
              f"{sum(tally.values())/1e6:.0f} MB)", flush=True)

    def chain_sync(s):
        leaf = s["params"]["embeddings"]["fused"]["table"]
        return float(np.asarray(leaf[(0,) * leaf.ndim]))

    state = compiled(state)
    chain_sync(state)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(8):
            state = compiled(state)
        chain_sync(state)
        best = min(best, (time.perf_counter() - t0) / (8 * SCAN))

    flop_bound = flops / PEAK_BF16_FLOPS
    hbm_bound = bytes_acc / PEAK_HBM_GBS
    light = max(flop_bound, hbm_bound)
    print(json.dumps({
        "metric": "cost_analysis_40m_step",
        "container": trainer.table_container,
        "dedup_route": trainer.dedup_route,
        "scan": SCAN,
        "per_step_gflop": round(flops / 1e9, 2),
        "per_step_mb": round(bytes_acc / 1e6, 1),
        "flop_bound_us": round(flop_bound * 1e6, 1),
        "hbm_bound_us": round(hbm_bound * 1e6, 1),
        "measured_us": round(best * 1e6, 1),
        "pct_of_light": round(100 * light / best, 1),
    }))


if __name__ == "__main__":
    main()
