"""CSV -> packed-array data pipeline.

Reproduces the reference's ``ctrdataset`` semantics exactly
(utils/data_utils.py:14-100): joint train+test label-encoding space,
min-max scaling of dense columns, vocab = max+1, scene_feature appended to
feature columns, per-dataset fixups (kuairec/iaac/amazon_new), and the
domain test mask — but emits labels as an explicit [N, num_label_cols]
array instead of relying on pandas duplicate-column reindexing
(the reference duplicates label columns via df.reindex,
utils/data_utils.py:65-70, and selects them back with train[target]).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from .config import ExperimentConfig
from .features import DenseFeat, FeatureLayout, SparseFeat


def get_test_mask(domain_values, mask_values, num_domains) -> np.ndarray:
    """(reference utils/data_utils.py:96-100)"""
    dv = np.asarray(domain_values).reshape(-1, 1)
    mv = np.asarray(mask_values).reshape(1, -1)
    return (dv == mv).astype(np.float32)


@dataclasses.dataclass
class CTRDataset:
    train_input: Dict[str, np.ndarray]
    test_input: Dict[str, np.ndarray]
    y_train: np.ndarray  # [N, num_label_columns] in label_columns order
    y_test: np.ndarray
    test_mask: Optional[np.ndarray]
    feature_columns: List  # SparseFeat/DenseFeat list (dnn == linear cols)
    layout: FeatureLayout
    train_df: Optional[pd.DataFrame] = None
    test_df: Optional[pd.DataFrame] = None


def ctrdataset(
    config: ExperimentConfig, keep_frames: bool = False, backend: str = "auto"
) -> CTRDataset:
    """backend: 'pandas' (reference-identical), 'native' (C++ loader,
    native/fast_csv.cpp), or 'auto' (native when applicable, else pandas).

    The native path is only used for datasets without the reference's
    string-casting fixups (kuairec/iaac/amazon_new) since those change the
    label-encoding sort order.
    """
    dc, mc = config.data_config, config.model_config
    train_path = dc.train_dataset_path
    needs_fixups = any(k in train_path for k in ("kuairec", "iaac", "amazon_new"))
    if backend == "native" or (backend == "auto" and not needs_fixups):
        try:
            return _ctrdataset_native(config)
        except Exception as e:  # noqa: BLE001
            if backend == "native":
                raise
            print(f"native csv loader unavailable ({e}); using pandas")
    return _ctrdataset_pandas(config, keep_frames)


def _ctrdataset_native(config: ExperimentConfig) -> CTRDataset:
    from .native import load_csv_columns

    dc, mc = config.data_config, config.model_config
    feature_columns = list(dc.feature_columns)
    if dc.scene_feature and dc.scene_feature not in feature_columns:
        feature_columns.append(dc.scene_feature)
    dense_columns = list(dc.dense_columns)
    label_columns = list(dc.label_columns)
    uniq_labels = list(dict.fromkeys(label_columns))
    mask_column = dc.mask_column
    want_mask = mc.task_name in ("msl", "mtmsl") and mask_column != ""

    cols: List[str] = []
    kinds: List[int] = []
    for c in feature_columns:
        cols.append(c)
        kinds.append(1)
    for c in dense_columns:
        cols.append(c)
        kinds.append(0)
    for c in uniq_labels:
        cols.append(c)
        kinds.append(0)
    if want_mask and mask_column not in cols:
        cols.append(mask_column)
        kinds.append(0)

    data, vocabs, train_rows, rows = load_csv_columns(
        dc.train_dataset_path, dc.test_dataset_path, cols, kinds
    )

    # min-max scale dense columns over the joint rows (reference :57-59),
    # using sklearn MinMaxScaler's exact formula x*scale + (-min*scale)
    for c in dense_columns:
        v = data[c]
        lo, hi = v.min(), v.max()
        span = hi - lo
        if span > 0:
            scale = 1.0 / span
            data[c] = v * scale + (-lo * scale)
        else:
            data[c] = np.zeros_like(v)

    fixlen = [
        SparseFeat(c, vocabulary_size=vocabs[c], embedding_dim=mc.emb)
        for c in feature_columns
    ] + [DenseFeat(c, 1) for c in dense_columns]
    layout = FeatureLayout(fixlen)

    names = layout.feature_names()
    train_input = {n: data[n][:train_rows] for n in names}
    test_input = {n: data[n][train_rows:] for n in names}
    test_mask = None
    if want_mask:
        mask_vals_series = (
            data[mask_column] if mask_column not in feature_columns else data[mask_column]
        )
        train_input[mask_column] = mask_vals_series[:train_rows]
        test_input[mask_column] = mask_vals_series[train_rows:]
        test_mask = get_test_mask(
            mask_vals_series[train_rows:], dc.mask_values, dc.num_domains
        )
    y_all = np.stack(
        [data[c].astype(np.float32) for c in label_columns], axis=1
    )
    return CTRDataset(
        train_input=train_input,
        test_input=test_input,
        y_train=y_all[:train_rows],
        y_test=y_all[train_rows:],
        test_mask=test_mask,
        feature_columns=fixlen,
        layout=layout,
    )


def _ctrdataset_pandas(config: ExperimentConfig, keep_frames: bool = False) -> CTRDataset:
    dc, mc = config.data_config, config.model_config
    all_columns = list(dc.all_columns)
    feature_columns = list(dc.feature_columns)
    dense_columns = list(dc.dense_columns)
    ignore_columns = list(dc.ignore_columns)
    label_columns = list(dc.label_columns)
    train_path, test_path = dc.train_dataset_path, dc.test_dataset_path

    train_df = pd.read_csv(train_path, usecols=all_columns)
    test_df = pd.read_csv(test_path, usecols=all_columns)

    # dataset-specific fixups (reference utils/data_utils.py:27-39)
    if "kuairec" in train_path:
        for col in all_columns:
            if "onehot" in col:
                train_df[col] = train_df[col].astype(str)
                test_df[col] = test_df[col].astype(str)
        train_df = train_df[train_df["user_active_degree"] != "0"]
    if "iaac" in train_path:
        train_df["predict_category_property"] = train_df["predict_category_property"].astype(str)
        test_df["predict_category_property"] = test_df["predict_category_property"].astype(str)
        test_df = test_df[:-2]

    train_len = len(train_df)
    df = pd.concat([train_df, test_df])

    task_name = mc.task_name
    mask_column = dc.mask_column
    scene_feature = dc.scene_feature
    emb = mc.emb

    if scene_feature != "" and scene_feature not in feature_columns:
        feature_columns.append(scene_feature)  # reference :49-50

    from sklearn.preprocessing import LabelEncoder, MinMaxScaler

    for col in all_columns:
        if col not in label_columns + ignore_columns:
            if "amazon_new" in train_path:
                df[col] = df[col].astype(str)
            if col in dense_columns:
                df[col] = MinMaxScaler().fit_transform(df[[col]]).reshape(-1)
            else:
                df[col] = LabelEncoder().fit_transform(df[col])

    fixlen = [
        SparseFeat(feat, vocabulary_size=int(df[feat].max()) + 1, embedding_dim=emb)
        for feat in feature_columns
    ] + [DenseFeat(feat, 1) for feat in dense_columns]
    layout = FeatureLayout(fixlen)

    train, test = df[:train_len], df[train_len:]
    names = layout.feature_names()
    train_input = {name: train[name].to_numpy() for name in names}
    test_input = {name: test[name].to_numpy() for name in names}

    test_mask = None
    if task_name in ("msl", "mtmsl") and mask_column != "":
        if mask_column not in names:
            train_input[mask_column] = train[mask_column].to_numpy()
            test_input[mask_column] = test[mask_column].to_numpy()
        else:
            train_input[mask_column] = train[mask_column].to_numpy()
            test_input[mask_column] = test[mask_column].to_numpy()
        test_mask = get_test_mask(
            test[mask_column].to_numpy(), dc.mask_values, dc.num_domains
        )

    # labels in label_columns order (duplicates allowed — the reference
    # achieves the same via duplicated reindex columns)
    y_train = np.stack(
        [train[c].to_numpy().astype(np.float32) for c in label_columns], axis=1
    )
    y_test = np.stack(
        [test[c].to_numpy().astype(np.float32) for c in label_columns], axis=1
    )

    return CTRDataset(
        train_input=train_input,
        test_input=test_input,
        y_train=y_train,
        y_test=y_test,
        test_mask=test_mask,
        feature_columns=fixlen,
        layout=layout,
        train_df=train if keep_frames else None,
        test_df=test if keep_frames else None,
    )
