"""END-TO-END 40M-row fit wall-clock (host metadata + device steps).

bench_40m_table_update.py measures the DEVICE step (2.5 ms = 1.66M
ex/s); this measures Trainer.fit wall-clock at the same 40M x 32 shape —
the number that includes the per-epoch host metadata prep
(trainer._fs_host_prep thread-ahead) and all staging overheads.  The
round-4b finding: numpy metadata costs 4.6-6.4 ms/batch, ABOVE the
device step, so fits were host-bound; the native single-pass kernel
(native/step_metadata.cpp) is 1.6-2.0 ms/batch and hides behind the
device epoch.

Usage: python benchmarks/bench_40m_fit_e2e.py [native|numpy|block|nocompact|devicemeta ...]
("block" = native metadata + shuffle='block': fixed batch composition,
metadata staged ONCE and reordered on device per epoch; "nocompact" =
the full-shuffle native arm with the round-5 uint16/uint8 metadata
upload compaction DISABLED — the A/B for the ~3x byte cut; "devicemeta"
= full shuffle with the round-5 IN-STEP metadata (device_step_metadata:
one lax.sort per batch, zero metadata uploads — trades the route win
for upload-free epochs)
Env: ROWS (default 1_000_000), EPOCHS (default 4), VOCAB_PER_FEATURE,
IDS_DIST=zipf (zipf-1.1 ids — the realistic CTR distribution; default
uniform).
Prints one JSON line per arm; steady-state ex/s excludes epoch 1
(compile + first staging).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VOCAB = int(os.environ.get("VOCAB_PER_FEATURE", 2_500_000))
ROWS = int(os.environ.get("ROWS", 1_000_000))
EPOCHS = int(os.environ.get("EPOCHS", 4))
N_SPARSE, EMB_DIM, BATCH = 16, 32, 4096


def run(arm: str):
    import jax
    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config
    from mmlrec_tpu.train import Trainer
    from mmlrec_tpu.train import sparse_embedding as se

    orig = se.batch_step_metadata
    if arm == "numpy":
        se.batch_step_metadata = functools.partial(orig, use_native=False)
    try:
        cfg = make_config(
            task_name="mtl", model_name="mmoe", emb=EMB_DIM,
            n_sparse=N_SPARSE, n_dense=4, hidden=(256, 128), tower=(64,),
            gate=(64,), batch_size=BATCH, two_phase_embedding=True,
            table_opt_dtype="bfloat16", table_update="pallas",
            table_container="stacked",
            meta_compact=(arm != "nocompact"),
            **({"device_metadata": True, "dedup_route": "scatter"}
               if arm == "devicemeta" else {}),
        )
        cols = [SparseFeat(f"s{i}", VOCAB, EMB_DIM)
                for i in range(N_SPARSE)] + [
            DenseFeat(f"d{i}", 1) for i in range(4)]
        model = get_model("mmoe", FeatureLayout(cols), cfg)
        tr = Trainer(model, seed=0).compile(metrics=[])

        rng = np.random.default_rng(0)
        if os.environ.get("IDS_DIST") == "zipf":
            ids = (rng.zipf(1.1, (ROWS, N_SPARSE)) % VOCAB).astype(np.int32)
        else:
            ids = rng.integers(0, VOCAB, (ROWS, N_SPARSE)).astype(np.int32)
        dense = rng.random((ROWS, 4)).astype(np.float32)
        y = rng.integers(0, 2, (ROWS, 2)).astype(np.float32)
        x = {f"s{i}": ids[:, i] for i in range(N_SPARSE)} | {
            f"d{i}": dense[:, i] for i in range(4)}

        shuffle = "block" if arm == "block" else True
        t0 = time.perf_counter()
        tr.fit(x, y, batch_size=BATCH, epochs=EPOCHS, verbose=0,
               shuffle=shuffle)
        total = time.perf_counter() - t0
        epoch_times = [h["epoch_s"] for h in tr.history]
        print(f"[{arm}] epochs: "
              + " ".join(f"{t:.2f}s" for t in epoch_times), flush=True)
        steady = min(epoch_times[1:]) if len(epoch_times) > 1 else total
        out = {
            "metric": "40m_fit_e2e",
            "arm": arm,
            "rows": ROWS,
            "epochs": EPOCHS,
            "steady_epoch_s": round(steady, 2),
            "steady_examples_per_s": round(ROWS / steady, 0),
            "total_s": round(total, 1),
        }
        print(json.dumps(out), flush=True)
        return out
    finally:
        se.batch_step_metadata = orig


if __name__ == "__main__":
    arms = sys.argv[1:] or ["native", "numpy"]
    if len(arms) == 1:
        run(arms[0])
    else:
        # one arm per process: back-to-back 10 GB states can OOM through
        # the relay (server-side frees lag — CLAUDE.md gotcha)
        import subprocess

        for a in arms:
            subprocess.run([sys.executable, os.path.abspath(__file__), a],
                           check=False)
            time.sleep(20)
