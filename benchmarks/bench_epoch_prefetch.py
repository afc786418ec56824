"""Epoch-level A/B of the full-shuffle two-phase metadata thread-ahead.

trainer.py's fs_pool prefetch computes epoch e+1's host metadata (~4 ms per
batch at K=65k, train/sparse_embedding.py batch_step_metadata) in a worker
while epoch e's dispatches execute; before round 2 the device idled through
that prep at every epoch boundary.  This measures real fit() epochs at a
production-ish shape (8M x 32 table, two_phase + auto pallas table_update,
full shuffle) with the thread-ahead on vs off.  One JSON line with warm
per-epoch seconds (first epoch excluded: it pays the compiles).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 512_000
VOCAB_PER = 500_000  # x16 features -> 8M fused rows
BATCH = 4096
EPOCHS = 5


def run(prefetch: int):
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config, make_data
    from mmlrec_tpu.train import Trainer

    cfg = make_config(
        task_name="mtl", model_name="sharedbottom", n_sparse=16, n_dense=4,
        emb=32, hidden=(64, 32), tower=(16,), gate=(16,), vocab=VOCAB_PER,
        batch_size=BATCH, lr=1e-3, epochs=EPOCHS,
        two_phase_embedding=True, prefetch_batches=prefetch,
    )
    layout, x, y, _ = make_data(cfg, n=ROWS, seed=0)
    model = get_model("sharedbottom", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=BATCH, epochs=EPOCHS, shuffle=True, verbose=0)
    times = [h["epoch_s"] for h in tr.history]
    return times


def main():
    out = {"metric": "epoch_prefetch_ab", "rows": ROWS, "batch": BATCH}
    for name, pf in (("off", 0), ("on", 2)):
        times = run(pf)
        warm = times[1:]
        out[f"{name}_epoch_s"] = [round(t, 3) for t in times]
        out[f"{name}_warm_s"] = round(min(warm), 3)
    out["speedup"] = round(out["off_warm_s"] / out["on_warm_s"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
