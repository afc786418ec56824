"""Device-eval A/B: fused on-device validation metrics vs the host path.

Host path (_evaluate_prepared): scanned predict on device, download the
full [N, H] f32 prediction matrix through the relay, sklearn AUC/acc.
Device path (_make_eval_program): same scanned predict fused with
train/device_metrics.py regime metrics; only scalars come back.

Flagship shapes (MMoE, AliExpress-like MSL), validation N swept.  Both
paths end in host scalars, so plain wall timing is honest (no
block_until_ready involved).  Best-of-N per point, interleaved.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import aliexpress_like_config, make_data
    from mmlrec_tpu.train import Trainer

    batch_size = 4096
    cfg = aliexpress_like_config("mmoe", batch_size=batch_size)
    cfg.training_config.extra["device_eval"] = True

    for n_val in (65_536, 524_288):
        layout, xv, yv, _ = make_data(cfg, n=n_val, seed=9)
        model = get_model("mmoe", layout, cfg)
        tr = Trainer(model, seed=0).compile(metrics=["auc", "acc"])
        ids, dense = tr.pack_inputs(xv)
        y2 = tr._prepare_y(yv)
        dmask = tr._domain_mask_from(xv)
        tr.variables = tr._init_variables(ids[:2], dense[:2])

        # train briefly so validation scores have realistic spread (at raw
        # init the per-head sigmoids sit within ~1e-7 of 0.5 and AUC is a
        # coin flip either way)
        import jax

        state = {
            "params": tr.variables["params"],
            "batch_stats": tr.variables.get("batch_stats", {}),
            "opt_state": tr.tx.init(tr.variables["params"]),
            "rng": jax.random.PRNGKey(1),
        }
        step = tr._make_train_step()
        w = jnp.ones((batch_size,), jnp.float32)
        for i in range(min(20, len(ids) // batch_size)):
            b = slice(i * batch_size, (i + 1) * batch_size)
            state, *_ = step(
                state,
                (jnp.asarray(ids[b]), jnp.asarray(dense[b]), jnp.asarray(y2[b]),
                 jnp.asarray(dmask[b]) if dmask is not None else None, w),
            )
        tr.variables = {
            "params": state["params"], "batch_stats": state["batch_stats"]
        }

        val_dev = tr._prepare_eval_tensors(ids, dense, dmask, batch_size)
        metric_dev = tr._prepare_metric_tensors(y2, val_dev)
        program = tr._make_eval_program()

        # warm both paths (compile)
        host_res = tr._evaluate_prepared(tr.variables, val_dev, y2)
        dev_res = {
            k: float(np.asarray(v))
            for k, v in program(
                tr.variables, val_dev[0], val_dev[1], val_dev[2], *metric_dev
            ).items()
        }
        for k in host_res:
            assert abs(host_res[k] - dev_res[k]) < 1e-3, (k, host_res, dev_res)

        host_t, dev_t = [], []
        for _ in range(6):
            t0 = time.perf_counter()
            tr._evaluate_prepared(tr.variables, val_dev, y2)
            host_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            {
                k: float(np.asarray(v))
                for k, v in program(
                    tr.variables, val_dev[0], val_dev[1], val_dev[2], *metric_dev
                ).items()
            }
            dev_t.append(time.perf_counter() - t0)
        h, d = min(host_t), min(dev_t)
        print(
            f"N={n_val}: host {h*1e3:.1f} ms  device {d*1e3:.1f} ms  "
            f"speedup {h/d:.2f}x  (auc host {host_res['auc']:.4f} dev {dev_res['auc']:.4f})"
        )


if __name__ == "__main__":
    main()
