"""Same-window decomposition of the flagship end-to-end fit epoch
(round 5, VERDICT r4 #3).

bench.py's step metric times a FIXED batch (no data fetch, no loss
outputs); Trainer.fit's epoch additionally pays the staged-slice fetch,
the epoch-step counter, the stacked (loss, probs) outputs, and per-epoch
host work (uploads + readbacks + python).  Window throughput swings 2-3x,
so only a same-window A/B attributes the difference.  Three programs, all
977 steps (= one 4M-row epoch), interleaved per round:

  A fixed   jit(scan(977)) of _step_body on one fixed batch — bench.py's
            program at epoch length;
  B slice   the fit's actual scan runner (staged dataset + per-step
            dynamic_slice fetch + loss/probs outputs);
  C fit     a full Trainer.fit epoch (shuffle='block'), wall-clock.

(C - B) = per-epoch host machinery; (B - A) = data-fetch + output cost.
Run: python benchmarks/probe_flagship_fit_stages.py  [rounds]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS = int(os.environ.get("ROWS", 4_000_000))
BATCH = 4096


def main(rounds: int = 3):
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import aliexpress_like_config
    from mmlrec_tpu.train import Trainer

    steps = ROWS // BATCH
    cfg = aliexpress_like_config("mmoe")
    cfg.data_config.mask_column = "scene"
    cfg.data_config.mask_values = [0, 1]
    cols = [SparseFeat(f"s{i}", 1000, 8) for i in range(16)] + [
        DenseFeat(f"d{i}", 1) for i in range(61)]
    model = get_model("mmoe", FeatureLayout(cols), cfg)
    tr = Trainer(model, seed=0).compile(metrics=[])

    rng = np.random.default_rng(0)
    x = {f"s{i}": rng.integers(0, 1000, ROWS).astype(np.int32)
         for i in range(16)}
    x |= {f"d{i}": rng.random(ROWS).astype(np.float32) for i in range(61)}
    x["scene"] = rng.integers(0, 2, ROWS).astype(np.int32)
    y = rng.integers(0, 2, (ROWS, 1)).astype(np.float32)

    ids_np, dense_np = tr.pack_inputs(x)
    y2 = tr._prepare_y(y)
    dmask = tr._domain_mask_from(x)
    tr.variables = tr._init_variables(ids_np[:2], dense_np[:2])
    state0 = {
        "params": tr.variables["params"],
        "batch_stats": tr.variables.get("batch_stats", {}),
        "opt_state": tr.tx.init(tr.variables["params"]),
        "rng": jax.random.PRNGKey(1),
    }

    def sync(s):
        return float(np.asarray(s["params"]["out"]["bias"].ravel()[0]))

    # ---- A: fixed-batch scan epoch (bench.py program at epoch length)
    fixed_batch = (
        jnp.asarray(ids_np[:BATCH]), jnp.asarray(dense_np[:BATCH]),
        jnp.asarray(y2[:BATCH]),
        jnp.asarray(dmask[:BATCH]) if dmask is not None else None,
        jnp.ones((BATCH,), jnp.float32),
    )

    def a_body(s, _):
        ns, *_ = tr._step_body(s, fixed_batch)
        return ns, ()

    a_fn = jax.jit(
        lambda s: jax.lax.scan(a_body, s, None, length=steps)[0],
        donate_argnums=(0,),
    )

    # ---- B: the fit's slice scan runner on the staged dataset
    staged = tr._stage_dataset(ids_np, dense_np, y2, dmask)
    starts = jnp.arange(steps, dtype=jnp.int32) * BATCH
    w2d = jnp.ones((steps, BATCH), jnp.float32)
    runner = tr._make_scan_runner("slice", BATCH, steps)

    def run_a(s):
        s = dict(s)
        s.pop("epoch_step", None)
        s = a_fn(s)
        return s, sync(s)

    def run_b(s):
        s = dict(s)
        s["epoch_step"] = jnp.zeros((), jnp.int32)
        s, tls, probs = runner(s, staged, starts, w2d, None)
        return s, sync(s)

    # compile
    state = jax.tree_util.tree_map(jnp.copy, state0)
    state, _ = run_a(state)
    state, _ = run_b(state)

    times = {"A_fixed": [], "B_slice": []}
    for r in range(rounds):
        for name, fn in (("A_fixed", run_a), ("B_slice", run_b)):
            t0 = time.perf_counter()
            state, _ = fn(state)
            times[name].append(time.perf_counter() - t0)
        time.sleep(2)

    # ---- C: full fit epochs in the same process/window
    tr2 = Trainer(get_model("mmoe", FeatureLayout(cols), cfg),
                  seed=0).compile(metrics=[])
    tr2.fit(x, y, batch_size=BATCH, epochs=3, verbose=0, shuffle="block")
    c_steady = min(h["epoch_s"] for h in tr2.history[1:])

    a, b = min(times["A_fixed"]), min(times["B_slice"])
    out = {
        "metric": "flagship_fit_epoch_stages",
        "steps": steps,
        "A_fixed_epoch_s": round(a, 3),
        "B_slice_epoch_s": round(b, 3),
        "C_fit_epoch_s": round(c_steady, 3),
        "fetch_outputs_s": round(b - a, 3),
        "host_fixed_s": round(c_steady - b, 3),
        "A_examples_per_s": round(ROWS / a, 0),
        "C_examples_per_s": round(ROWS / c_steady, 0),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
