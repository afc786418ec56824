"""Native C++ CSV loader: build, parity with the pandas/sklearn path."""

import numpy as np
import pandas as pd
import pytest

from mmlrec_tpu.config import ExperimentConfig
from mmlrec_tpu.data import _ctrdataset_pandas, ctrdataset


@pytest.fixture(scope="module")
def native_lib():
    try:
        from mmlrec_tpu.native import get_lib

        return get_lib()
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"native toolchain unavailable: {e}")


def _make_files(tmp_path, n_tr=300, n_te=120):
    rng = np.random.default_rng(7)
    n = n_tr + n_te
    df = pd.DataFrame(
        {
            "cat_str": rng.choice(["alpha", "beta", "gamma", "zz"], n),
            "cat_int": rng.integers(0, 9, n),
            "scene": rng.integers(0, 2, n),
            "num_a": rng.normal(3, 2, n),
            "num_b": rng.random(n) * 100,
            "label": rng.integers(0, 2, n),
        }
    )
    # quoted field with comma to exercise the RFC-4180 path
    df.loc[0, "cat_str"] = "with,comma"
    train_p, test_p = str(tmp_path / "tr.csv"), str(tmp_path / "te.csv")
    df[:n_tr].to_csv(train_p, index=False)
    df[n_tr:].to_csv(test_p, index=False)
    raw = {
        "data_config": {
            "data_name": "nat",
            "train_dataset_path": train_p,
            "test_dataset_path": test_p,
            "all_columns": ["cat_str", "cat_int", "scene", "num_a", "num_b", "label"],
            "feature_columns": ["cat_str", "cat_int", "scene"],
            "dense_columns": ["num_a", "num_b"],
            "label_columns": ["label", "label"],
            "num_domains": 2,
            "mask_values": [0, 1],
            "mask_column": "scene",
            "scene_feature": "scene",
        },
        "model_config": {"task_name": "msl", "model_name": "mmoe", "emb": 4,
                         "task_names": ["a", "b"],
                         "task_types": ["binary", "binary"]},
        "optim_config": {}, "training_config": {}, "save_config": {},
    }
    return ExperimentConfig.from_dict(raw)


def test_native_matches_pandas_pipeline(tmp_path, native_lib):
    cfg = _make_files(tmp_path)
    ds_nat = ctrdataset(cfg, backend="native")
    ds_pd = _ctrdataset_pandas(cfg)

    for name in ["cat_str", "cat_int", "scene", "num_a", "num_b"]:
        np.testing.assert_allclose(
            np.asarray(ds_nat.train_input[name], np.float64),
            np.asarray(ds_pd.train_input[name], np.float64),
            rtol=1e-9, atol=1e-12, err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(ds_nat.test_input[name], np.float64),
            np.asarray(ds_pd.test_input[name], np.float64),
            rtol=1e-9, atol=1e-12, err_msg=name,
        )
    nat_vocab = {s.feature.name: s.feature.vocabulary_size
                 for s in ds_nat.layout.sparse_slots}
    pd_vocab = {s.feature.name: s.feature.vocabulary_size
                for s in ds_pd.layout.sparse_slots}
    assert nat_vocab == pd_vocab
    np.testing.assert_allclose(ds_nat.y_train, ds_pd.y_train)
    np.testing.assert_allclose(ds_nat.test_mask, ds_pd.test_mask)


def test_native_auto_backend_roundtrip(tmp_path, native_lib):
    """auto backend trains end-to-end through the trainer."""
    cfg = _make_files(tmp_path)
    ds = ctrdataset(cfg, backend="auto")
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.train import Trainer

    model = get_model("mmoe", ds.layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(ds.train_input, ds.y_train, batch_size=128, epochs=1, verbose=0)
    preds = tr.predict(ds.test_input, batch_size=128)
    assert preds.shape[0] == len(ds.y_test)
    assert np.isfinite(preds).all()
