"""AUC parity: reference (torch, imported from its read-only mount) vs
mmlrec_tpu, trained on IDENTICAL synthetic CSV data with the reference
protocol (same config hyperparameters, early stop on val AUC, best model).

Forward parity is pinned by tests; this checks that full TRAINING runs land
at the same quality.  Results are recorded in BASELINE.md.

Run:  MMLREC_PLATFORM=cpu python benchmarks/auc_parity.py
(CPU keeps both sides on the same arithmetic; TPU works too.)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np
import pandas as pd

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("MMLREC_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["MMLREC_PLATFORM"])

N_TRAIN, N_TEST = 30000, 10000
SEEDS = [0, 2, 4, 8]
MODELS = ["sharedbottom", "mmoe", "esmm", "ple"]


def make_csvs(tmpdir: str):
    rng = np.random.default_rng(123)
    n = N_TRAIN + N_TEST
    df = pd.DataFrame()
    for i in range(6):
        df[f"c{i}"] = rng.integers(0, 50, n)
    df["c6"] = rng.choice(["a", "b", "c", "d"], n)
    df["n0"] = rng.random(n)
    df["n1"] = rng.normal(0, 1, n)
    logits1 = (
        (df["c0"] % 7) / 3.5 - 1 + df["n0"] * 1.2 + (df["c6"] == "a") * 0.8
        + rng.normal(0, 1.2, n)
    )
    logits2 = (df["c1"] % 5) / 2.5 - 1 + df["n1"] * 0.7 + rng.normal(0, 1.2, n)
    df["label"] = (logits1 > 0).astype(int)
    df["label2"] = (logits2 > 0).astype(int)
    train_p = os.path.join(tmpdir, "train.csv")
    test_p = os.path.join(tmpdir, "test.csv")
    df[:N_TRAIN].to_csv(train_p, index=False)
    df[N_TRAIN:].to_csv(test_p, index=False)
    return train_p, test_p


def make_config(train_p, test_p, model_name):
    data_config = {
        "data_name": "parity",
        "train_dataset_path": train_p,
        "test_dataset_path": test_p,
        "all_columns": [f"c{i}" for i in range(7)] + ["n0", "n1", "label", "label2"],
        "feature_columns": [f"c{i}" for i in range(7)],
        "dense_columns": ["n0", "n1"],
        "ignore_columns": [],
        "label_columns": ["label", "label2"],
    }
    if model_name in ("apg", "pepnet"):
        # scene-conditioned families read the scene embedding
        # (reference model/apg.py:136-141, model/pepnet.py:90-97)
        data_config["scene_feature"] = "c6"
    return {
        "data_config": data_config,
        "model_config": {
            "task_name": "mtl",
            "model_name": model_name,
            "task": "binary",
            "task_names": ["ctr", "ctcvr"],
            "task_types": ["binary", "binary"],
            "emb": 8,
            "num_experts": 4,
            "expert_dnn_hidden_units": [64, 32],
            "bottom_dnn_hidden_units": [64, 32],
            "gate_dnn_hidden_units": [16],
            "tower_dnn_hidden_units": [16],
            "dnn_hidden_units": [64, 32],
            "l2_reg_linear": 0, "l2_reg_embedding": 0, "l2_reg_dnn": 0,
            "dnn_use_bn": False, "dnn_dropout": 0.0, "dnn_activation": "relu",
            "use_cka_loss": False,
        },
        "optim_config": {
            "lr": 0.001, "optimizer": "adam",
            "loss": ["binary_crossentropy", "binary_crossentropy"],
            "metrics": ["auc"], "early_stop": 3,
        },
        "training_config": {"train_batch_size": 1024, "test_batch_size": 1024,
                            "epochs": 10},
        "save_config": {"save": False, "save_layer_output": False},
    }


def run_reference(config, seed):
    import copy
    import random

    import torch
    from sklearn.metrics import roc_auc_score

    sys.path.insert(0, REF)
    from utils.data_utils import ctrdataset as ref_ctrdataset

    def ref_cls(name):
        import importlib

        mod_cls = {
            "mmoe": ("mmoe", "MMOE"),
            "sharedbottom": ("sharedbottom", "SharedBottom"),
            "esmm": ("esmm", "ESMM"),
            "ple": ("ple", "PLE"),
            "mlp": ("mlp", "MLP"),
            "snr_trans": ("snr_trans", "SNR_trans"),
            "mssm": ("mssm", "MSSM"),
            "cross_stitch": ("cross_stitch", "CrossStitch"),
            "hmoe": ("hmoe", "HMOE"),
            "aitm": ("aitm", "AITM"),
            "escm": ("escm", "ESCM"),
            "apg": ("apg", "APG"),
            "pepnet": ("pepnet", "PepNet"),
            "star": ("star", "STAR"),
        }[name]
        m = importlib.import_module(f"model.{mod_cls[0]}")
        return getattr(m, mod_cls[1])

    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)

    cfg = copy.deepcopy(config)
    train, test, _, tr_in, te_in, _, dnn_cols = ref_ctrdataset(cfg)
    name = cfg["model_config"]["model_name"]
    cls = ref_cls(name)
    model = cls(dnn_cols, device="cpu", config=cfg)
    model.compile(optimizer="adam",
                  loss=["binary_crossentropy", "binary_crossentropy"],
                  metrics=["auc"])
    target = ["label", "label2"]
    best = model.fit(tr_in, train[target].values,
                     batch_size=cfg["training_config"]["train_batch_size"],
                     epochs=cfg["training_config"]["epochs"],
                     validation_data=(te_in, test[target].values))
    preds = best.predict(te_in, 1024)
    return [
        round(float(roc_auc_score(test[t].values, preds[:, i])), 4)
        for i, t in enumerate(target)
    ]


def run_ours(config, seed):
    import copy

    from sklearn.metrics import roc_auc_score

    from mmlrec_tpu.config import ExperimentConfig
    from mmlrec_tpu.data import ctrdataset
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.train import Trainer
    from mmlrec_tpu.utils import set_seed

    set_seed(seed)
    cfg = ExperimentConfig.from_dict(copy.deepcopy(config))
    ds = ctrdataset(cfg)
    model = get_model(cfg.model_config.model_name, ds.layout, cfg)
    tr = Trainer(model, seed=seed).compile()
    tr.fit(ds.train_input, ds.y_train,
           batch_size=cfg.training_config.train_batch_size,
           epochs=cfg.training_config.epochs,
           validation_data=(ds.test_input, ds.y_test), verbose=0)
    preds = tr.predict(ds.test_input, 1024)
    return [
        round(float(roc_auc_score(ds.y_test[:, i], preds[:, i])), 4)
        for i in range(2)
    ]


def main():
    models = sys.argv[1].split(",") if len(sys.argv) > 1 else MODELS
    seeds = [int(s) for s in sys.argv[2].split(",")] if len(sys.argv) > 2 else SEEDS
    tmpdir = tempfile.mkdtemp()
    train_p, test_p = make_csvs(tmpdir)
    results = {}
    for model_name in models:
        config = make_config(train_p, test_p, model_name)
        for seed in seeds:
            ref_auc = run_reference(config, seed)
            our_auc = run_ours(config, seed)
            results[f"{model_name}_seed{seed}"] = {
                "reference": ref_auc, "ours": our_auc,
                "max_abs_diff": round(
                    max(abs(a - b) for a, b in zip(ref_auc, our_auc)), 4
                ),
            }
            print(json.dumps({f"{model_name}_seed{seed}":
                              results[f"{model_name}_seed{seed}"]}))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
