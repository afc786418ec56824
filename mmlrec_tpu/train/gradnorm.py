"""GradNorm — gradient-norm-based loss balancing (Chen et al., 2018).

The reference ships a dead, broken GradNorm (references an undefined global
``args`` and is never called; model/optimizer.py:141-180, SURVEY §2.4.4).
This is a correct, jit-friendly implementation.

Per step, given per-task gradient pytrees g_i (of w_i * L_i):

    G_i      = || restrict(g_i, shared params) ||
    r_i      = (L_i / L_i(0)) / mean_j(L_j / L_j(0))        inverse train rate
    target_i = stop_grad( mean_j G_j * r_i ** alpha )
    dw_i     = d/dw_i  sum_j |G_j - target_j|  = sign(G_i - target_i) * G_i / w_i

weights are updated with plain SGD and renormalized to sum to T.
Enable via ``model_config.extra['use_gradnorm'] = true`` (alpha/lr via
``gradnorm_alpha`` / ``gradnorm_lr``).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def _global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves) + 1e-12)


def gradnorm_update(
    weights: jnp.ndarray,  # [T] current task weights (w_i > 0)
    task_losses: jnp.ndarray,  # [T] current L_i (unweighted)
    initial_losses: jnp.ndarray,  # [T] L_i at step 0
    task_grads: List,  # per-task gradient pytrees of (w_i * L_i)
    alpha: float = 1.5,
    lr: float = 0.025,
):
    T = weights.shape[0]
    norms = jnp.stack([_global_norm(g) for g in task_grads])  # G_i
    loss_ratio = task_losses / jnp.maximum(initial_losses, 1e-12)
    inv_rate = loss_ratio / jnp.mean(loss_ratio)
    target = jax.lax.stop_gradient(jnp.mean(norms) * inv_rate**alpha)
    # d|G_i - target_i|/dw_i with G_i = w_i * raw_norm_i  => raw = G_i / w_i
    raw = norms / jnp.maximum(weights, 1e-12)
    dw = jnp.sign(norms - target) * raw
    new_w = jnp.maximum(weights - lr * dw, 1e-3)
    return new_w * (T / jnp.sum(new_w)), norms
