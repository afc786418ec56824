"""Final-evaluation metric parity with the reference's main.py logic
(reference main.py:134-172): per-head domain-masked LogLoss/AUC + total AUC."""

import numpy as np
import pytest
from sklearn.metrics import log_loss, roc_auc_score

from mmlrec_tpu.train.metrics import masked_test_metrics, regime_eval
from mmlrec_tpu.train import get_metric_fns


def _data(T, D, n=400, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, (n, T)).astype(np.float64)
    preds = rng.uniform(0.01, 0.99, (n, T))
    dom = rng.integers(0, D, n)
    mask = np.eye(D)[dom].astype(np.float32)
    return y, preds, mask, dom


def test_msl_masked_metrics_match_reference_formula():
    T = D = 3
    y, preds, mask, dom = _data(T, D)
    res = masked_test_metrics(y, preds, "msl", D, mask, ["binary"] * T)
    for i in range(T):
        sel = dom == i
        # reference main.py:136-144: masked_select per head
        assert res[f"log_loss_{i}"] == round(float(log_loss(y[sel, i], preds[sel, i])), 4)
        assert res[f"auc_{i}"] == round(float(roc_auc_score(y[sel, i], preds[sel, i])), 4)
    # total AUC over summed (masked) predictions (main.py:145)
    assert res["total_auc"] == round(
        float(roc_auc_score(y[:, 0], preds.sum(axis=1))), 4
    )


def test_mtmsl_masked_metrics_match_reference_formula():
    T, D = 4, 2
    y, preds, mask, dom = _data(T, D)
    res = masked_test_metrics(y, preds, "mtmsl", D, mask, ["binary"] * T)
    for i in range(T):
        j = i % D  # reference main.py:148-149
        sel = dom == j
        assert res[f"auc_{i}"] == round(float(roc_auc_score(y[sel, i], preds[sel, i])), 4)
    # 2-column total AUC (main.py:159-162)
    y_true = y[:, [0, D]]
    y_pred = np.stack([preds[:, :D].sum(1), preds[:, D:].sum(1)], axis=1)
    assert res["total_auc"] == round(float(roc_auc_score(y_true, y_pred)), 4)


def test_mtl_metrics_unmasked():
    y, preds, _, _ = _data(2, 1)
    res = masked_test_metrics(y, preds, "mtl", 1, None, ["binary", "binary"])
    for i in range(2):
        assert res[f"auc_{i}"] == round(float(roc_auc_score(y[:, i], preds[:, i])), 4)
    assert "total_auc" not in res


def test_regime_eval_msl_validation_aggregation():
    # reference evaluate (basemodel.py:384-385): metric(y[:,0], sum preds)
    y, preds, _, _ = _data(2, 2)
    fns = get_metric_fns(["auc"])
    out = regime_eval(fns, y, preds, "msl", 2)
    assert abs(out["auc"] - roc_auc_score(y[:, 0], preds.sum(1))) < 1e-12
