"""Measure the REFERENCE implementation's training throughput.

Imports the reference code directly from /root/reference (read-only mount)
— no code is copied — and times its MMoE train loop on the AliExpress-MSL
schema shapes (configs_msl/config_AE.json: 16 sparse x emb 8 + 61 dense,
batch 4096) with synthetic data.  The reference targets CUDA/CPU torch; in
this environment torch is CPU-only, so this measures the reference on the
only hardware it can use here.  The resulting examples/s is recorded in
BASELINE.md and used as bench.py's ``vs_baseline`` denominator.

Run:  python benchmarks/bench_reference_torch.py [--predict]

--predict times the inference path instead (model.eval() + no_grad
forward, the core of the reference's predict(), model/basemodel.py:395-457,
sans its per-batch numpy round-trips) for BASELINE.md's inference table.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_PATH = "/root/reference"


def main():
    sys.path.insert(0, REFERENCE_PATH)
    import torch
    from model.mmoe import MMOE
    from model.utils import SparseFeat, DenseFeat, build_input_features

    n_sparse, n_dense, vocab, emb = 16, 61, 100, 8
    batch_size = 4096
    cols = [SparseFeat(f"s{i}", vocab, emb) for i in range(n_sparse)] + [
        DenseFeat(f"d{i}", 1) for i in range(n_dense)
    ]
    config = {
        "data_config": {"num_domains": 2, "label_columns": ["label", "label"]},
        "model_config": {
            "task_name": "msl",
            "model_name": "mmoe",
            "task_names": ["ctr", "ctr"],
            "task_types": ["binary", "binary"],
            "num_experts": 4,
            "expert_dnn_hidden_units": [256, 128],
            "gate_dnn_hidden_units": [64],
            "tower_dnn_hidden_units": [64],
            "l2_reg_embedding": 0.0,
            "l2_reg_dnn": 0.0,
        },
        "optim_config": {"lr": 0.005},
        "training_config": {},
        "save_config": {},
    }
    model = MMOE(cols, device="cpu", config=config)
    model.compile(
        optimizer="adam",
        loss=["binary_crossentropy", "binary_crossentropy"],
        metrics=[],  # exclude the reference's per-batch sklearn overhead
    )

    rng = np.random.default_rng(0)
    ids = rng.integers(0, vocab, (batch_size, n_sparse)).astype(np.float32)
    dense = rng.random((batch_size, n_dense), dtype=np.float32)
    x = torch.from_numpy(np.concatenate([ids, dense], axis=1))
    y = torch.from_numpy(rng.integers(0, 2, (batch_size, 2)).astype(np.float32))

    if "--predict" in sys.argv:
        model.eval()

        def run(iters):
            with torch.no_grad():
                t0 = time.perf_counter()
                for _ in range(iters):
                    model(x, None)
                return time.perf_counter() - t0

        run(3)
        iters = 50
        dt = run(iters)
        print(json.dumps({
            "metric": "reference_torch_cpu_predict_throughput_mmoe_ae",
            "value": round(batch_size * iters / dt, 1),
            "unit": "examples/s",
            "batch4096_ms": round(dt / iters * 1e3, 2),
        }))
        return

    loss_funcs = model.loss_func
    optim = model.optim
    model.train()

    def step():
        y_pred = model(x, None).squeeze()
        optim.zero_grad()
        loss = sum(
            loss_funcs[i](y_pred[:, i], y[:, i], reduction="sum") for i in range(2)
        )
        total = loss + model.get_regularization_loss() + model.aux_loss
        total.backward()
        optim.step()

    for _ in range(3):
        step()
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    eps = batch_size * iters / dt
    print(json.dumps({
        "metric": "reference_torch_cpu_train_throughput_mmoe_ae",
        "value": round(eps, 1),
        "unit": "examples/s",
    }))


if __name__ == "__main__":
    main()
