"""Dataset-specific preprocessing fixups vs the reference pipeline
(reference utils/data_utils.py:27-39, :55-56): kuairec onehot str-cast +
active-degree filter, iaac str-cast + drop-last-2 test rows, amazon_new
all-columns str-cast."""

import copy
import os
import sys

import numpy as np
import pandas as pd
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
if REF not in sys.path:
    sys.path.insert(0, REF)

from mmlrec_tpu.config import ExperimentConfig
from mmlrec_tpu.data import ctrdataset


def _compare(raw, feature_names):
    from utils.data_utils import ctrdataset as ref_ctrdataset

    r_train, r_test, _, r_tr_in, r_te_in, _, r_dnn = ref_ctrdataset(
        copy.deepcopy(raw)
    )
    ds = ctrdataset(ExperimentConfig.from_dict(copy.deepcopy(raw)),
                    backend="pandas")
    for name in feature_names:
        np.testing.assert_allclose(
            np.asarray(ds.train_input[name], np.float64),
            np.asarray(r_tr_in[name].values, np.float64),
            err_msg=f"train {name}",
        )
        np.testing.assert_allclose(
            np.asarray(ds.test_input[name], np.float64),
            np.asarray(r_te_in[name].values, np.float64),
            err_msg=f"test {name}",
        )
    ref_vocabs = {c.name: c.vocabulary_size for c in r_dnn
                  if hasattr(c, "vocabulary_size")}
    our_vocabs = {s.feature.name: s.feature.vocabulary_size
                  for s in ds.layout.sparse_slots}
    assert ref_vocabs == our_vocabs


def _base_raw(train_p, test_p, features, all_cols):
    return {
        "data_config": {
            "data_name": "x",
            "train_dataset_path": train_p,
            "test_dataset_path": test_p,
            "all_columns": all_cols,
            "feature_columns": features,
            "dense_columns": [],
            "ignore_columns": [],
            "label_columns": ["label", "label"],
        },
        "model_config": {"task_name": "mtl", "model_name": "mmoe", "emb": 4,
                         "task_names": ["a", "b"],
                         "task_types": ["binary", "binary"]},
        "optim_config": {}, "training_config": {}, "save_config": {},
    }


def test_kuairec_fixups(tmp_path):
    rng = np.random.default_rng(0)
    n = 120
    df = pd.DataFrame({
        "user_active_degree": rng.choice(["0", "low", "high", "full"], n),
        "onehot_feat0": rng.integers(0, 5, n).astype(float),  # float -> str cast
        "onehot_feat1": rng.integers(0, 3, n),
        "label": rng.integers(0, 2, n),
    })
    train_p = str(tmp_path / "kuairec_train.csv")
    test_p = str(tmp_path / "kuairec_test.csv")
    df[:80].to_csv(train_p, index=False)
    df[80:].to_csv(test_p, index=False)
    raw = _base_raw(train_p, test_p,
                    ["user_active_degree", "onehot_feat0", "onehot_feat1"],
                    ["user_active_degree", "onehot_feat0", "onehot_feat1", "label"])
    _compare(raw, ["user_active_degree", "onehot_feat0", "onehot_feat1"])


def test_iaac_fixups(tmp_path):
    rng = np.random.default_rng(1)
    n = 100
    df = pd.DataFrame({
        "predict_category_property": rng.integers(100, 110, n),
        "item_brand_id": rng.integers(0, 9, n),
        "label": rng.integers(0, 2, n),
    })
    train_p = str(tmp_path / "iaac_train.csv")
    test_p = str(tmp_path / "iaac_test.csv")
    df[:70].to_csv(train_p, index=False)
    df[70:].to_csv(test_p, index=False)
    raw = _base_raw(train_p, test_p,
                    ["predict_category_property", "item_brand_id"],
                    ["predict_category_property", "item_brand_id", "label"])
    _compare(raw, ["predict_category_property", "item_brand_id"])
    # the iaac fixup drops the last 2 test rows (data_utils.py:38)
    ds = ctrdataset(ExperimentConfig.from_dict(raw), backend="pandas")
    assert len(ds.y_test) == 30 - 2


def test_amazon_new_fixups(tmp_path):
    rng = np.random.default_rng(2)
    n = 90
    # numeric values whose STRING sort differs from numeric sort (2 vs 10)
    df = pd.DataFrame({
        "vote": rng.choice([2, 10, 101, 3], n),
        "style_new": rng.integers(0, 4, n),
        "label": rng.integers(0, 2, n),
    })
    train_p = str(tmp_path / "amazon_new_train.csv")
    test_p = str(tmp_path / "amazon_new_test.csv")
    df[:60].to_csv(train_p, index=False)
    df[60:].to_csv(test_p, index=False)
    raw = _base_raw(train_p, test_p, ["vote", "style_new"],
                    ["vote", "style_new", "label"])
    _compare(raw, ["vote", "style_new"])
