"""Linear CKA inter-domain representation-similarity loss.

The reference imports ``utils.CKA.linear_CKA_torch`` which does not exist in
the repo (basemodel.py:548, SURVEY §2.4.3) — the API surface (add_cka_loss,
basemodel.py:545-555) is kept and the missing implementation supplied here:
standard linear CKA,  CKA(X, Y) = ||Yc Xc^T||_F^2 / (||Xc Xc^T||_F ||Yc Yc^T||_F)
on column-centered feature matrices.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_cka(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """x, y: [B, F] representation matrices -> scalar CKA in [0, 1]."""
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    yc = y - jnp.mean(y, axis=0, keepdims=True)
    hsic = jnp.sum(jnp.square(xc.T @ yc))
    norm_x = jnp.sqrt(jnp.sum(jnp.square(xc.T @ xc)))
    norm_y = jnp.sqrt(jnp.sum(jnp.square(yc.T @ yc)))
    return hsic / (norm_x * norm_y + eps)


def cka_domain_loss(last_layer: jnp.ndarray, domain_mask: jnp.ndarray,
                    alpha: float = 0.5) -> jnp.ndarray:
    """Pairwise CKA between domain-masked representations
    (reference add_cka_loss, basemodel.py:545-555)."""
    D = domain_mask.shape[-1]
    total = 0.0
    for i in range(D - 1):
        for j in range(i + 1, D):
            emb_i = last_layer * domain_mask[:, i][:, None]
            emb_j = last_layer * domain_mask[:, j][:, None]
            total = total + linear_cka(emb_i, emb_j)
    return alpha * total
