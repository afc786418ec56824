"""End-to-end experiment-driver tests: CSV files -> config JSON -> main flow
-> results CSV with the reference row schema (reference main.py:79-178)."""

import json
import sys

import numpy as np
import pandas as pd
import pytest


def _write_dataset(tmp_path, task_name="mtl", n_tr=600, n_te=240, num_domains=2):
    rng = np.random.default_rng(0)
    n = n_tr + n_te
    df = pd.DataFrame(
        {
            "cat_a": rng.choice(["x", "y", "z"], n),
            "cat_b": rng.integers(0, 7, n),
            "scene": rng.integers(0, num_domains, n),
            "num_a": rng.normal(0, 1, n),
            "label": rng.integers(0, 2, n),
            "label2": rng.integers(0, 2, n),
        }
    )
    # learnable signal
    df["label"] = ((df["cat_b"] > 3) ^ (rng.random(n) < 0.2)).astype(int)
    train_p = str(tmp_path / "train.csv")
    test_p = str(tmp_path / "test.csv")
    df[:n_tr].to_csv(train_p, index=False)
    df[n_tr:].to_csv(test_p, index=False)

    if task_name == "mtl":
        label_columns = ["label", "label2"]
        extra = {}
        n_heads = 2
    elif task_name == "msl":
        label_columns = ["label"] * num_domains
        extra = {"num_domains": num_domains,
                 "mask_values": list(range(num_domains)),
                 "mask_column": "scene", "scene_feature": "scene"}
        n_heads = num_domains
    else:
        label_columns = ["label"] * num_domains + ["label2"] * num_domains
        extra = {"num_domains": num_domains,
                 "mask_values": list(range(num_domains)),
                 "mask_column": "scene", "scene_feature": "scene"}
        n_heads = 2 * num_domains

    cfg = {
        "data_config": {
            "data_name": "e2e",
            "train_dataset_path": train_p,
            "test_dataset_path": test_p,
            "test_result_path": str(tmp_path / "results.csv"),
            "all_columns": ["cat_a", "cat_b", "scene", "num_a", "label", "label2"],
            "feature_columns": ["cat_a", "cat_b", "scene"],
            "dense_columns": ["num_a"],
            "ignore_columns": [],
            "label_columns": label_columns,
            **extra,
        },
        "model_config": {
            "task_name": task_name,
            "model_name": "sharedbottom",
            "task": "binary",
            "task_names": ["ctr"] * n_heads,
            "task_types": ["binary"] * n_heads,
            "emb": 4,
            "bottom_dnn_hidden_units": [16, 8],
            "tower_dnn_hidden_units": [8],
            "expert_dnn_hidden_units": [16, 8],
            "gate_dnn_hidden_units": [8],
            "dnn_hidden_units": [16, 8],
            "l2_reg_embedding": 0, "l2_reg_dnn": 0,
            "dnn_use_bn": False, "dnn_dropout": 0.0,
            "dnn_activation": "relu", "use_cka_loss": False,
        },
        "optim_config": {
            "lr": 0.01, "optimizer": "adam",
            "loss": ["binary_crossentropy"] * n_heads,
            "metrics": ["auc", "acc"], "early_stop": 3,
        },
        "training_config": {"train_batch_size": 256, "test_batch_size": 256,
                            "epochs": 2},
        "save_config": {"save": False, "save_layer_output": False},
    }
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return cfg_path, str(tmp_path / "results.csv")


def _run_main(argv):
    # import by explicit path: other tests put the reference repo (which has
    # its own main.py) on sys.path
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "mmlrec_main", os.path.join(repo, "main.py")
    )
    main_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(main_mod)

    old = sys.argv
    sys.argv = ["main.py"] + argv
    try:
        main_mod.main()
    finally:
        sys.argv = old


@pytest.mark.parametrize("task_name", ["mtl", "msl", "mtmsl"])
def test_main_end_to_end(tmp_path, task_name):
    cfg_path, results_path = _write_dataset(tmp_path, task_name)
    _run_main(["--config", cfg_path, "--seed", "0"])
    df = pd.read_csv(results_path)
    assert len(df) == 1
    row = df.iloc[0]
    assert row["type"] == f"e2e_{task_name}_sharedbottom_0"
    n_heads = {"mtl": 2, "msl": 2, "mtmsl": 4}[task_name]
    for i in range(n_heads):
        assert 0 <= row[f"auc_{i}"] <= 1
        assert row[f"log_loss_{i}"] > 0
    if task_name in ("msl", "mtmsl"):
        assert 0 <= row["total_auc"] <= 1


def test_main_seed_suite_appends_rows(tmp_path):
    cfg_path, results_path = _write_dataset(tmp_path, "mtl")
    _run_main(["--config", cfg_path, "--seeds", "0,2"])
    df = pd.read_csv(results_path)
    assert len(df) == 2
    assert list(df["type"]) == ["e2e_mtl_sharedbottom_0", "e2e_mtl_sharedbottom_2"]


def test_main_model_override(tmp_path):
    cfg_path, results_path = _write_dataset(tmp_path, "mtl")
    _run_main(["--config", cfg_path, "--seed", "0", "--run", "1",
               "--model_name", "mmoe"])
    df = pd.read_csv(results_path)
    assert df.iloc[0]["type"] == "e2e_mtl_mmoe_0"


def test_main_synthetic_mode(tmp_path):
    cfg_path, results_path = _write_dataset(tmp_path, "msl")
    _run_main(["--config", cfg_path, "--seed", "0", "--synthetic",
               "--synthetic_rows", "1200"])
    df = pd.read_csv(results_path)
    assert len(df) == 1
