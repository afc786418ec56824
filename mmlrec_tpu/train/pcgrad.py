"""PCGrad — projecting conflicting gradients (reference model/optimizer.py:10-138).

The reference's PCGrad is broken at the call site (it receives one scalar
total loss instead of a list of per-task objectives, basemodel.py:309-310,
SURVEY §2.4.4).  This implementation takes the *intended* input — one
gradient pytree per task — and runs entirely inside jit:

  1. flatten each task gradient to a vector
  2. for each g_i, project out conflicts with every g_j:
         g_i -= (g_i . g_j) g_j / ||g_j||^2     when g_i . g_j < 0
     (reference _project_conflicting, optimizer.py:47-67; the reference
     shuffles task order per projection — here order is deterministic
     for reproducibility)
  3. merge: mean over tasks on *shared* parameters (every task has nonzero
     gradient), sum on task-specific ones.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def _flatten(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([jnp.ravel(l) for l in leaves]), leaves


def _unflatten_like(vec, leaves):
    out, idx = [], 0
    for l in leaves:
        n = l.size
        out.append(jnp.reshape(vec[idx : idx + n], l.shape))
        idx += n
    return out


def pcgrad_merge(task_grads: List):
    """task_grads: list of gradient pytrees (one per task) -> merged pytree."""
    treedef = jax.tree_util.tree_structure(task_grads[0])
    flats, leaves0 = [], None
    for g in task_grads:
        v, leaves = _flatten(g)
        flats.append(v)
        if leaves0 is None:
            leaves0 = leaves
    G = jnp.stack(flats)  # [T, P]
    T = G.shape[0]

    def project_one(gi):
        def body(carry, gj):
            gi = carry
            dot = jnp.dot(gi, gj)
            coef = jnp.where(dot < 0, dot / (jnp.sum(gj * gj) + 1e-12), 0.0)
            return gi - coef * gj, None

        gi_out, _ = jax.lax.scan(body, gi, G)
        return gi_out

    pc = jax.vmap(project_one)(G)  # [T, P]

    # shared params: every task contributes a nonzero gradient (reference
    # has_grads product, optimizer.py:48); granularity is per *parameter
    # tensor* there — replicated here by reducing per-leaf.
    has = jnp.stack(
        [
            jnp.concatenate(
                [
                    jnp.broadcast_to(jnp.any(l != 0), (l.size,)).ravel()
                    for l in jax.tree_util.tree_leaves(g)
                ]
            )
            for g in task_grads
        ]
    )  # [T, P] bool
    shared = jnp.all(has, axis=0)
    merged = jnp.where(shared, jnp.mean(pc, axis=0), jnp.sum(pc, axis=0))
    return jax.tree_util.tree_unflatten(treedef, _unflatten_like(merged, leaves0))
