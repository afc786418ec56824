"""Multi-task / multi-scenario loss functions.

Reproduces the reference's loss dispatch (model/basemodel.py:270-298):
sum-reduced per-head losses summed over heads; optional per-domain weighting
for MSL/MTMSL (the *intended* masked path, :273-282); the ESCM IPW
counterfactual branch (:284-292 + model/escm.py:99-111).

All losses accept a ``sample_weight`` [B] used both for the intended domain
masking and for zero-weighting padded rows (the trainer pads the last batch
to a fixed shape so XLA compiles one program).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

_EPS = 1e-12
# torch F.binary_cross_entropy clamps log terms at -100.
_LOG_CLAMP = -100.0


def bce_elementwise(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    logp = jnp.maximum(jnp.log(jnp.maximum(pred, _EPS)), _LOG_CLAMP)
    log1mp = jnp.maximum(jnp.log(jnp.maximum(1.0 - pred, _EPS)), _LOG_CLAMP)
    return -(target * logp + (1.0 - target) * log1mp)


def mse_elementwise(pred, target):
    return jnp.square(pred - target)


def mae_elementwise(pred, target):
    return jnp.abs(pred - target)


_LOSS_FNS = {
    "binary_crossentropy": bce_elementwise,
    "mse": mse_elementwise,
    "mae": mae_elementwise,
}


def get_loss_fn(name: str):
    if name not in _LOSS_FNS:
        raise NotImplementedError(f"loss {name!r}")
    return _LOSS_FNS[name]


def escm_loss(
    probs: jnp.ndarray,
    y: jnp.ndarray,
    weight: jnp.ndarray,
    loss_names: Sequence[str],
    counterfactual_w: float = 0.1,
    global_w: float = 1.0,
) -> jnp.ndarray:
    """ESCM^2 objective (reference basemodel.py:284-292, escm.py:99-111).

    probs columns: [pCTR, pCVR, pCTCVR]; y columns: [ctr_label, cvr_label].
    loss = L(ctr) + 0.1 * IPW(L(cvr)) + 1.0 * L(ctcvr vs cvr_label).

    Reference-faithful details: loss_1 is the *scalar* sum-reduced CVR loss
    broadcast against the per-sample inverse propensity (escm.py:109), and
    ``ips.stop_gradient = True`` is a Paddle-ism that is a no-op under
    torch, so gradients DO flow through the propensity (pCTR); both are kept.
    """
    fns = [get_loss_fn(n) for n in loss_names[:2]]
    w = weight
    loss_0 = jnp.sum(fns[0](probs[:, 0], y[:, 0]) * w)
    loss_1 = jnp.sum(fns[1](probs[:, 1], y[:, 1]) * w)
    loss_2 = jnp.sum(fns[1](probs[:, 2], y[:, 1]) * w)

    ctr_num = jnp.sum(y[:, 0] * w)
    o = y[:, 0] * w
    ps = jnp.maximum(probs[:, 0] * ctr_num, 1e-6)
    ips = jnp.clip(1.0 / ps, -15.0, 15.0)
    # The reference multiplies ips by the true batch length and then takes a
    # mean over the same length (escm.py:104-111), so the length cancels:
    # result == loss_1 * sum_b clip(1/ps_b) * o_b.  Here the padded length B
    # cancels identically (padded rows have o == 0 and contribute nothing),
    # so this is EXACT for any last-batch size — pinned by
    # tests/test_losses.py::test_escm_loss_partial_batch_parity.
    batch_size = jnp.sum(jnp.ones_like(o))
    ips = ips * batch_size
    loss_1 = jnp.mean(loss_1 * ips * o)
    return loss_0 + counterfactual_w * loss_1 + global_w * loss_2


def multitask_loss(
    probs: jnp.ndarray,
    y: jnp.ndarray,
    sample_weight: jnp.ndarray,
    loss_names: Sequence[str],
    task_name: str,
    num_domains: int,
    domain_mask: Optional[jnp.ndarray] = None,
    model_name: str = "",
    loss_weights: Optional[Sequence[float]] = None,
) -> jnp.ndarray:
    """Total training loss for one batch.

    - default / unmasked: sum_i sum_b bce(pred_i, y_i)      (basemodel.py:294-296)
    - msl   + mask:  per-head loss weighted by domain_mask[:, i]   (:274-275)
    - mtmsl + mask:  head i weighted by domain_mask[:, i % D]      (:276-282)
    - escm: see escm_loss                                          (:284-292)
    - loss_weights: per-head scalar weights — a config key the reference
      defines but never reads (SURVEY §2.4.5); honored when provided.
    """
    num_tasks = probs.shape[-1] if model_name not in ("escm", "escm_dr") else y.shape[-1]
    if model_name in ("escm", "escm_dr"):
        return escm_loss(probs, y, sample_weight, loss_names)

    fns = [get_loss_fn(n) for n in list(loss_names)[:num_tasks]]
    if len(fns) < num_tasks:
        fns = fns + [fns[-1]] * (num_tasks - len(fns))

    total = 0.0
    for i in range(num_tasks):
        w = sample_weight
        if domain_mask is not None:
            if task_name == "msl":
                w = w * domain_mask[:, i]
            elif task_name == "mtmsl":
                w = w * domain_mask[:, i % num_domains]
        head = jnp.sum(fns[i](probs[:, i], y[:, i]) * w)
        if loss_weights is not None:
            head = head * loss_weights[i % len(loss_weights)]
        total = total + head
    return total


def per_task_losses(
    probs: jnp.ndarray,
    y: jnp.ndarray,
    sample_weight: jnp.ndarray,
    loss_names: Sequence[str],
    task_name: str,
    num_domains: int,
    domain_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-head sum-reduced losses as a [T] vector (same branch logic as
    multitask_loss; used by PCGrad/GradNorm)."""
    num_tasks = probs.shape[-1]
    fns = [get_loss_fn(n) for n in list(loss_names)[:num_tasks]]
    if len(fns) < num_tasks:
        fns = fns + [fns[-1]] * (num_tasks - len(fns))
    out = []
    for i in range(num_tasks):
        w = sample_weight
        if domain_mask is not None:
            if task_name == "msl":
                w = w * domain_mask[:, i]
            elif task_name == "mtmsl":
                w = w * domain_mask[:, i % num_domains]
        out.append(jnp.sum(fns[i](probs[:, i], y[:, i]) * w))
    return jnp.stack(out)


def l2_regularization(
    params,
    l2_embedding: float,
    l2_dnn: float,
    dnn_prefixes: Optional[Sequence[str]] = None,
    l2_linear: float = 0.0,
) -> jnp.ndarray:
    """L2 penalty (reference get_regularization_loss, basemodel.py:524-540).

    Embedding tables always get ``l2_reg_embedding`` (reference
    basemodel.py:129 registers the whole embedding_dict).

    The ``l2_reg_dnn`` inclusion set is model-specific in the reference:
    each model registers an idiosyncratic list of modules via
    ``add_regularization_weight(filter('weight' in name and 'bn' not in
    name, module.named_parameters()))`` — e.g. MMoE registers
    gate/tower/expert DNNs + final layers (model/mmoe.py:36-62) while
    SNR/MSSM register ONLY the tower DNN (model/snr_trans.py:108-110,
    model/mssm.py:129-131) and STAR/APG/PepNet register nothing at all.

    ``dnn_prefixes`` carries that per-model set (each model's
    ``REG_DNN_PREFIXES``): a leaf is penalized iff its top-level module
    name starts with one of the prefixes and the leaf is weight-like —
    a ``kernel``, or a PReLU ``alpha`` (torch names PReLU's parameter
    ``weight``, so the reference's 'weight'-in-name filter includes it;
    biases and BN params never match).
    ``dnn_prefixes=None`` falls back to the round-1 global heuristic
    (every kernel-like weight) — opt-in via ``l2_reg_inclusion:
    "all_kernels"``.
    """
    emb_loss = 0.0
    dnn_loss = 0.0
    lin_loss = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        path_str = "/".join(str(k) for k in keys)
        if keys and str(keys[0]) == "wide_linear":
            # opt-in wide term: the reference registers the Linear module's
            # params at l2_reg_linear (basemodel.py:130)
            if l2_linear:
                lin_loss = lin_loss + jnp.sum(jnp.square(leaf))
            continue
        if "embeddings" in path_str or "table" in path_str:
            if l2_embedding:
                emb_loss = emb_loss + jnp.sum(jnp.square(leaf))
            continue
        if dnn_prefixes is not None:
            top = str(keys[0]) if keys else ""
            leaf_name = str(keys[-1])
            # the reference's filter is `'weight' in name and 'bn' not in
            # name`: that is every Linear kernel PLUS torch PReLU's
            # parameter (named `weight`); our _PReLU names it `alpha`.
            # BN scale/bias ('bn' in name there, scale/bias here) excluded.
            weight_like = leaf_name == "kernel" or (
                leaf_name == "alpha"
                and any(str(k).startswith("prelu") for k in keys)
            )
            include = weight_like and any(
                top.startswith(pref) for pref in dnn_prefixes
            )
        else:
            include = any(
                k in path_str
                for k in ("kernel", "trans", "cross_stitch_weight", "w_")
            ) and not path_str.endswith("bias")
        if include and l2_dnn:
            dnn_loss = dnn_loss + jnp.sum(jnp.square(leaf))
    return l2_embedding * emb_loss + l2_dnn * dnn_loss + l2_linear * lin_loss
