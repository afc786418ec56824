"""Serving-path benchmark: jitted forward (predict) latency + throughput.

Per model family (AliExpress-MSL shapes, same schema as bench.py): chained
batch-4096 throughput and single-batch latency at batch 1 and 256.  All
timings end with a dependency-chained host readback (block_until_ready is
unreliable on this backend — CLAUDE.md).

Prints one JSON line per model.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODELS = [
    "sharedbottom", "mlp", "mmoe", "hmoe", "ple", "cross_stitch", "esmm",
    "escm", "aitm", "snr_trans", "mssm", "star", "apg", "pepnet",
]


def bench_model(name: str, iters: int = 100, trials: int = 3):
    import jax

    if os.environ.get("MMLREC_PLATFORM") == "cpu":
        # the env var alone is ignored once the TPU plugin registers
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import aliexpress_like_config, make_data
    from mmlrec_tpu.train import Trainer

    cfg = aliexpress_like_config(name)
    layout, x, y, _ = make_data(cfg, n=4096, seed=0)
    model = get_model(name, layout, cfg)
    tr = Trainer(model, seed=0).compile(metrics=[])
    ids, dense = tr.pack_inputs(x)
    ids, dense = jnp.asarray(ids), jnp.asarray(dense)
    variables = model.init(jax.random.PRNGKey(0), ids[:2], dense[:2], None,
                           train=False)

    fwd = jax.jit(lambda v, i, d: model.apply(v, i, d, None, train=False))

    def sync(o):
        return float(np.asarray(o.ravel()[0]))

    def timed(i_, d_, reps):
        out = fwd(variables, i_, d_)
        sync(out)
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fwd(variables, i_, d_)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    t_big = timed(ids, dense, iters)
    t_256 = timed(ids[:256], dense[:256], iters)
    t_1 = timed(ids[:1], dense[:1], iters)
    print(json.dumps({
        "model": name,
        "throughput_examples_per_s": round(4096 / t_big, 0),
        "batch4096_ms": round(t_big * 1e3, 3),
        "batch256_ms": round(t_256 * 1e3, 3),
        "batch1_ms": round(t_1 * 1e3, 3),
    }), flush=True)


def main():
    models = sys.argv[1].split(",") if len(sys.argv) > 1 else MODELS
    for name in models:
        bench_model(name)


if __name__ == "__main__":
    main()
