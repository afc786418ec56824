"""Evaluation metrics (reference basemodel.py:606-635 uses sklearn).

AUC/LogLoss are computed on the host once per epoch over the gathered
predictions — the reference syncs device->host and runs sklearn per *batch*
(basemodel.py:316-331), a major throughput sink eliminated here.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    log_loss,
    mean_squared_error,
    roc_auc_score,
)


def _accuracy(y_true, y_pred):
    return accuracy_score(np.asarray(y_true).reshape(-1),
                          np.where(np.asarray(y_pred).reshape(-1) > 0.5, 1, 0))


def get_metric_fns(names: Sequence[str]) -> Dict[str, Callable]:
    fns: Dict[str, Callable] = {}
    for m in names or []:
        if m in ("binary_crossentropy", "logloss"):
            fns[m] = log_loss
        elif m == "auc":
            fns[m] = roc_auc_score
        elif m == "mse":
            fns[m] = mean_squared_error
        elif m in ("accuracy", "acc"):
            fns[m] = _accuracy
    return fns


def regime_eval(
    metric_fns: Dict[str, Callable],
    y: np.ndarray,
    preds: np.ndarray,
    task_name: str,
    num_domains: int,
) -> Dict[str, float]:
    """Validation-time aggregation (reference evaluate, basemodel.py:373-393).

    msl:   metric(y[:,0], sum_i pred_i)
    mtmsl: metric(y[:, [0, D]], [sum preds[:, :D], sum preds[:, D:]])
    mtl:   metric(y, preds)  (sklearn multi-output average)
    """
    out = {}
    for name, fn in metric_fns.items():
        if task_name == "msl":
            out[name] = float(fn(y[:, 0], np.sum(preds, axis=-1)))
        elif task_name == "mtmsl":
            D = num_domains
            y_new = y[:, [0, D]]
            p_new = np.stack(
                [np.sum(preds[:, :D], axis=-1), np.sum(preds[:, D:], axis=-1)], axis=-1
            )
            out[name] = float(fn(y_new, p_new))
        else:
            out[name] = float(fn(y, preds))
    return out


def masked_test_metrics(
    y: np.ndarray,
    preds: np.ndarray,
    task_name: str,
    num_domains: int,
    test_mask,
    task_types: Sequence[str],
) -> Dict[str, float]:
    """Final test metrics with per-domain masking + total AUC
    (reference main.py:134-172)."""
    results: Dict[str, float] = {}
    for i, _ in enumerate(task_types):
        if task_name == "msl":
            m = test_mask[:, i].astype(bool)
            results[f"log_loss_{i}"] = round(float(log_loss(y[m, i], preds[m, i])), 4)
            results[f"auc_{i}"] = round(float(roc_auc_score(y[m, i], preds[m, i])), 4)
        elif task_name == "mtmsl":
            j = i % num_domains
            m = test_mask[:, j].astype(bool)
            results[f"log_loss_{i}"] = round(float(log_loss(y[m, i], preds[m, i])), 4)
            results[f"auc_{i}"] = round(float(roc_auc_score(y[m, i], preds[m, i])), 4)
        else:
            results[f"log_loss_{i}"] = round(float(log_loss(y[:, i], preds[:, i])), 4)
            results[f"auc_{i}"] = round(float(roc_auc_score(y[:, i], preds[:, i])), 4)
    if task_name == "msl":
        results["total_auc"] = round(
            float(roc_auc_score(y[:, 0], np.sum(preds, axis=-1))), 4
        )
    elif task_name == "mtmsl":
        D = num_domains
        y_new = y[:, [0, D]]
        p_new = np.stack(
            [np.sum(preds[:, :D], axis=-1), np.sum(preds[:, D:], axis=-1)], axis=-1
        )
        results["total_auc"] = round(float(roc_auc_score(y_new, p_new)), 4)
    return results
