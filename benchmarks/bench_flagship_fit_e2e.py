"""END-TO-END flagship fit wall-clock audit (round 5, VERDICT r4 #3).

bench.py measures the flagship STEP at 11-14M ex/s/chip; BASELINE's old
end-to-end `fit()` row predated both the round-2 2.3x step win and the
round-4b staging fixes.  This measures Trainer.fit wall-clock at the
flagship shape (AliExpress-like MSL mmoe: 16 sparse x emb 8 + 61 dense,
batch 4096) the way bench_40m_fit_e2e.py does: per-epoch wall vs the
implied device-only epoch, with device_eval off and on.

Arms:
  fit        full-shuffle fit, no validation
  fit_block  shuffle='block'
  fit_eval   shuffle='block' + validation_data + device_eval (the
             production epoch: train + on-device metrics)

Usage: python benchmarks/bench_flagship_fit_e2e.py [arms...]
Env: ROWS (default 4_000_000), VAL_ROWS (default 512_000), EPOCHS (4).
One JSON line per arm; steady epoch excludes epoch 1 (compile).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS = int(os.environ.get("ROWS", 4_000_000))
VAL_ROWS = int(os.environ.get("VAL_ROWS", 512_000))
EPOCHS = int(os.environ.get("EPOCHS", 4))
BATCH = 4096


def _data(cfg, rows, seed):
    from mmlrec_tpu.synthetic import make_data

    # make_data materializes DataFrames; build raw arrays directly at this
    # scale instead (schema-shaped ids/dense/labels + scene column)
    rng = np.random.default_rng(seed)
    n_sparse, n_dense = 16, 61
    vocab = 1000
    x = {f"s{i}": rng.integers(0, vocab, rows).astype(np.int32)
         for i in range(n_sparse)}
    x |= {f"d{i}": rng.random(rows).astype(np.float32)
          for i in range(n_dense)}
    x["scene"] = rng.integers(0, 2, rows).astype(np.int32)
    y = rng.integers(0, 2, (rows, 1)).astype(np.float32)
    return x, y


def run(arm: str):
    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import aliexpress_like_config
    from mmlrec_tpu.train import Trainer

    cfg = aliexpress_like_config("mmoe")
    if os.environ.get("SCAN_STEPS"):
        cfg.model_config.extra["scan_steps"] = (
            True if os.environ["SCAN_STEPS"] == "all"
            else int(os.environ["SCAN_STEPS"]))
    cfg.data_config.mask_column = "scene"
    cfg.data_config.mask_values = [0, 1]
    if arm == "fit_eval":
        cfg.training_config.extra["device_eval"] = True
    cols = [SparseFeat(f"s{i}", 1000, 8) for i in range(16)] + [
        DenseFeat(f"d{i}", 1) for i in range(61)]
    model = get_model("mmoe", FeatureLayout(cols), cfg)
    tr = Trainer(model, seed=0).compile(
        metrics=["auc"] if arm == "fit_eval" else [])

    x, y = _data(cfg, ROWS, 0)
    kw = {}
    if arm == "fit_eval":
        vx, vy = _data(cfg, VAL_ROWS, 1)
        kw["validation_data"] = (vx, vy)
    shuffle = True if arm == "fit" else "block"
    t0 = time.perf_counter()
    tr.fit(x, y, batch_size=BATCH, epochs=EPOCHS, verbose=0,
           shuffle=shuffle, **kw)
    total = time.perf_counter() - t0
    epoch_times = [h["epoch_s"] for h in tr.history]
    print(f"[{arm}] epochs: " + " ".join(f"{t:.2f}s" for t in epoch_times),
          flush=True)
    steady = min(epoch_times[1:]) if len(epoch_times) > 1 else total
    out = {
        "metric": "flagship_fit_e2e",
        "arm": arm,
        "rows": ROWS,
        "steady_epoch_s": round(steady, 3),
        "steady_examples_per_s": round(ROWS / steady, 0),
        "total_s": round(total, 1),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    arms = sys.argv[1:] or ["fit", "fit_block", "fit_eval"]
    if len(arms) == 1:
        run(arms[0])
    else:
        import subprocess

        for a in arms:
            subprocess.run([sys.executable, os.path.abspath(__file__), a],
                           check=False)
            time.sleep(15)
