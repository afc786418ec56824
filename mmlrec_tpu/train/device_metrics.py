"""On-device validation metrics: exact AUC / accuracy / MSE as jnp programs.

The reference computes every metric with sklearn on host-gathered numpy
predictions (reference model/basemodel.py:316-331 syncs device->host per
*batch*; :373-393 aggregates per regime; :619-635 is the metric registry).
Our host path (train/metrics.py) already reduces that to one gather per
epoch, but on this image's relayed TPU backend the per-epoch download of a
full [N_test, H] prediction matrix is still wasted transfer: validation
only needs a handful of scalars.

This module computes the same regime-aggregated numbers INSIDE the jitted
evaluation program, so only scalars cross the host boundary:

* ``weighted_auc`` — exact ROC AUC via the rank statistic
  U = sum_{pos} (#neg below + 0.5 * #neg tied); identical to sklearn's
  trapezoidal ``roc_auc_score`` including tie handling (average ranks).
  One sort + prefix-sum + two binary searches; a row weight of 0 removes
  padding rows exactly.
* ``regime_metrics`` — the evaluate()-time aggregation of
  reference basemodel.py:373-393: msl sums heads against label 0, mtmsl
  sums task-major blocks of D heads, mtl macro-averages columns (sklearn's
  multi-output ``roc_auc_score`` average) and flattens for accuracy
  (train/metrics.py::_accuracy).

``logloss`` is intentionally NOT here: sklearn's 2-D ``log_loss`` has
row-normalization semantics we refuse to replicate blind; the trainer
falls back to the host path whenever an unsupported metric is requested.
All 12 reference config suites request ``["auc", "acc"]``.

Caveat: sums/cumsums run in float32 on TPU, so values can differ from
sklearn's float64 in the last ~1e-6; tests pin 1e-5 at N=16k.
"""

from __future__ import annotations

from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: metric names `regime_metrics` can produce on device
SUPPORTED = ("auc", "acc", "accuracy", "mse")


def supports(metric_names: Iterable[str]) -> bool:
    """True if EVERY requested metric has a device implementation."""
    names = list(metric_names)
    return bool(names) and all(m in SUPPORTED for m in names)


def weighted_auc(labels: jnp.ndarray, scores: jnp.ndarray,
                 weights: jnp.ndarray) -> jnp.ndarray:
    """Exact weighted ROC AUC of 1-D ``scores`` against binary ``labels``.

    Rows with weight 0 (padding) are excluded exactly: they participate in
    the sort but contribute no mass to the positive/negative totals.
    Returns NaN when either class is absent (sklearn raises instead).
    """
    labels = labels.astype(jnp.float32).reshape(-1)
    scores = scores.astype(jnp.float32).reshape(-1)
    weights = weights.astype(jnp.float32).reshape(-1)

    order = jnp.argsort(scores)
    s_sorted = scores[order]
    neg_w_sorted = (weights * (1.0 - labels))[order]
    # prefix[i] = total negative weight strictly before sorted position i
    prefix = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(neg_w_sorted)]
    )
    left = jnp.searchsorted(s_sorted, scores, side="left")
    right = jnp.searchsorted(s_sorted, scores, side="right")
    neg_below = prefix[left]
    neg_tied = prefix[right] - prefix[left]

    pos_w = weights * labels
    u_stat = jnp.sum(pos_w * (neg_below + 0.5 * neg_tied))
    total_pos = jnp.sum(pos_w)
    total_neg = jnp.sum(weights) - total_pos
    return u_stat / (total_pos * total_neg)


def _weighted_mean(values: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Mean of [N, C] ``values`` with per-row ``weights`` broadcast over C."""
    w = weights.reshape(-1, 1)
    return jnp.sum(values * w) / (jnp.sum(w) * values.shape[-1])


def regime_effective(y: jnp.ndarray, preds: jnp.ndarray, task_name: str,
                     num_domains: int, center: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(y_eff, p_eff) per reference evaluate() (basemodel.py:373-393).

    ``center=True`` sums ``preds - 0.5`` instead of ``preds`` for the
    msl/mtmsl head sums.  Rationale: AUC only needs the ORDER of the sums,
    and summing sigmoid outputs (each ~0.5) in float32 lands near H*0.5
    where the ulp is ~1e-7 — at early training the heads' spread is below
    that, so the f32 sums tie bitwise and the rank statistic collapses to
    0.5 (observed on TPU at init).  ``p - 0.5`` is exact for p in
    [0.25, 1] (Sterbenz), so the centered sum keeps the full spread around
    0.  Shift-invariant metrics (AUC) use the centered sum; value metrics
    (acc threshold, mse) must use the true sum.
    """
    shift = 0.5 if center else 0.0
    if task_name == "msl":
        return y[:, :1], jnp.sum(preds - shift, axis=-1, keepdims=True)
    if task_name == "mtmsl":
        D = num_domains
        y_eff = jnp.stack([y[:, 0], y[:, D]], axis=-1)
        p_eff = jnp.stack(
            [jnp.sum(preds[:, :D] - shift, axis=-1),
             jnp.sum(preds[:, D:] - shift, axis=-1)],
            axis=-1,
        )
        return y_eff, p_eff
    return y, preds


def weighted_logloss(labels: jnp.ndarray, probs: jnp.ndarray,
                     weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted binary cross-entropy matching sklearn's 1-D ``log_loss``.

    sklearn clips at float64 eps (effectively nothing for sigmoid
    outputs); float32 sigmoids CAN saturate to exactly 0/1, so we clip at
    float32 eps — the values only differ when the model is maximally
    certain-wrong (host ~34.5 vs ~15.9 per such sample).
    """
    labels = labels.astype(jnp.float32).reshape(-1)
    weights = weights.astype(jnp.float32).reshape(-1)
    eps = jnp.float32(np.finfo(np.float32).eps)
    p = jnp.clip(probs.astype(jnp.float32).reshape(-1), eps, 1.0 - eps)
    ce = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p))
    return jnp.sum(weights * ce) / jnp.sum(weights)


def masked_test_metrics_device(y: jnp.ndarray, preds: jnp.ndarray,
                               weights: jnp.ndarray, test_mask, task_name: str,
                               num_domains: int) -> Dict[str, jnp.ndarray]:
    """Device analogue of train/metrics.py::masked_test_metrics (reference
    main.py:134-172): per-head LogLoss/AUC masked to the head's domain rows
    (msl: head i = domain i; mtmsl: head i = domain i % D; mtl: unmasked),
    plus the summed-prediction total AUC for msl/mtmsl.  Call inside jit;
    ``preds`` must already be escm-column-selected."""
    n_heads = preds.shape[1]
    out: Dict[str, jnp.ndarray] = {}
    for i in range(n_heads):
        if task_name == "msl":
            w = weights * test_mask[:, i]
        elif task_name == "mtmsl":
            w = weights * test_mask[:, i % num_domains]
        else:
            w = weights
        out[f"log_loss_{i}"] = weighted_logloss(y[:, i], preds[:, i], w)
        out[f"auc_{i}"] = weighted_auc(y[:, i], preds[:, i], w)
    if task_name in ("msl", "mtmsl"):
        # total AUC over UNMASKED summed predictions (reference
        # main.py:143-163) == the regime_eval aggregation
        out["total_auc"] = regime_metrics(
            ("auc",), y, preds, weights, task_name, num_domains
        )["auc"]
    return out


def regime_metrics(metric_names: Iterable[str], y: jnp.ndarray,
                   preds: jnp.ndarray, weights: jnp.ndarray, task_name: str,
                   num_domains: int) -> Dict[str, jnp.ndarray]:
    """Device dict of scalars matching train/metrics.py::regime_eval for the
    supported metric set; call inside jit."""
    y_eff, p_eff = regime_effective(y, preds, task_name, num_domains)
    out: Dict[str, jnp.ndarray] = {}
    for name in metric_names:
        if name == "auc":
            y_rank, p_rank = regime_effective(
                y, preds, task_name, num_domains, center=True
            )
            per_col = jax.vmap(weighted_auc, in_axes=(1, 1, None))(
                y_rank, p_rank, weights
            )
            out[name] = jnp.mean(per_col)
        elif name in ("acc", "accuracy"):
            hard = jnp.where(p_eff > 0.5, 1.0, 0.0)
            out[name] = _weighted_mean(
                (hard == y_eff.astype(jnp.float32)).astype(jnp.float32), weights
            )
        elif name == "mse":
            out[name] = _weighted_mean(
                jnp.square(y_eff.astype(jnp.float32) - p_eff), weights
            )
        else:  # pragma: no cover - guarded by supports()
            raise NotImplementedError(name)
    return out
