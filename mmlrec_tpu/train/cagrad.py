"""CAGrad — conflict-averse gradient descent (Liu et al., 2021).

The reference declares ``def cagrad(): return`` (model/optimizer.py:183-184)
— an empty stub.  Supplied here as a working, jit-friendly implementation:

    min_{w in simplex}  w^T G g0  +  c * ||G^T w||,
    d = g0 + (c / ||g_w||) * g_w,    g0 = mean_i g_i,   c = alpha * ||g0||

The simplex program is solved with a few steps of gradient descent on a
softmax parameterization (the official implementation uses scipy SLSQP,
which cannot run inside jit — and sort-based simplex projection hits this
environment's slow-path primitives; see docs/perf_notes.md).

Enable via ``model_config.extra['use_cagrad'] = true``
(alpha via ``cagrad_alpha``, default 0.5; rescale applied as in the paper).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def _flatten(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([jnp.ravel(l) for l in leaves]), leaves


def _unflatten_like(vec, leaves, treedef):
    out, idx = [], 0
    for l in leaves:
        n = l.size
        out.append(jnp.reshape(vec[idx : idx + n], l.shape))
        idx += n
    return jax.tree_util.tree_unflatten(treedef, out)


def cagrad_merge(task_grads: List, alpha: float = 0.5, opt_steps: int = 25,
                 opt_lr: float = 0.5):
    """task_grads: per-task gradient pytrees -> merged pytree."""
    treedef = jax.tree_util.tree_structure(task_grads[0])
    flats, leaves0 = [], None
    for g in task_grads:
        v, leaves = _flatten(g)
        flats.append(v)
        if leaves0 is None:
            leaves0 = leaves
    G = jnp.stack(flats)  # [K, P]
    K = G.shape[0]
    GG = G @ G.T  # [K, K]
    g0_norm = jnp.sqrt(jnp.mean(GG) + 1e-8)
    c = alpha * g0_norm
    ones_k = jnp.ones((K,)) / K

    def objective(theta):
        w = jax.nn.softmax(theta)
        quad = w @ GG @ w
        lin = w @ GG @ ones_k
        return lin + c * jnp.sqrt(quad + 1e-8)

    grad_fn = jax.grad(objective)

    def body(theta, _):
        return theta - opt_lr * grad_fn(theta), None

    theta0 = jnp.zeros((K,))
    theta, _ = jax.lax.scan(body, theta0, None, length=opt_steps)
    w = jax.nn.softmax(theta)

    gw = w @ G  # [P]
    gw_norm = jnp.sqrt(jnp.sum(gw * gw) + 1e-8)
    lmbda = c / gw_norm
    d = jnp.mean(G, axis=0) + lmbda * gw
    d = d / (1.0 + alpha**2)  # rescale=1 in the official implementation
    return _unflatten_like(d, leaves0, treedef)
