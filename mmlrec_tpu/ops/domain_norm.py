"""STAR's partitioned (per-domain) batch normalization.

Reference: ``DomainBatchNorm`` model/utils.py:553-636.  Two modes:

* ``mode='reference'`` — reproduces the reference's *effective* training
  behaviour: ``F.batch_norm(..., training=True)`` normalizes the whole batch
  by the whole batch's stats regardless of domain (model/utils.py:585-592),
  so in training only gamma/beta are domain-specific.  The per-domain EMA
  population stats are still updated from the *domain-masked* rows
  (model/utils.py:582-584) and drive eval-time normalization (:626-632).

* ``mode='intended'`` — what the code comments describe: each domain's rows
  are normalized by that domain's masked batch statistics.

Both modes guard the EMA update on domain presence (the reference's
``torch.where`` evaluates both branches eagerly, so an absent domain would
poison the EMA with NaN from an empty mean — clearly unintended; SURVEY
§2.4 'hard parts' (c)).

Normalization uses biased variance; the EMA update uses unbiased variance
(torch ``Tensor.var`` default), decay 0.99, eps 1e-5 (the F.batch_norm
default — the reference's ``epsilon=1e-3`` ctor arg is never passed on).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import bn_axis


class DomainBatchNorm(nn.Module):
    num_features: int
    num_domains: int
    decay: float = 0.99
    eps: float = 1e-5
    mode: str = "reference"  # or "intended"

    @nn.compact
    def __call__(self, x, mask, *, train: bool = False):
        """x: [B, F]; mask: [B, D] one-hot domain membership -> [B, F].

        Under the explicit-collective shard_map step x/mask are the LOCAL
        batch shard; when ops.layers.bn_cross_replica_axis is active the
        batch statistics (counts, masked sums, whole-batch moments) are
        psum'd over that axis so they equal the global-batch statistics
        (reference computes whole-batch stats, model/utils.py:582-592).
        """
        D, F = self.num_domains, self.num_features
        ax = bn_axis()

        def gsum(v):
            return jax.lax.psum(v, ax) if ax else v

        n_rep = jax.lax.psum(1, ax) if ax else 1
        B_glob = x.shape[0] * n_rep
        gamma = self.param("gamma", nn.initializers.ones, (D, F))
        beta = self.param("beta", nn.initializers.zeros, (D, F))
        pop_mean = self.variable("batch_stats", "pop_mean", jnp.zeros, (D, F))
        pop_var = self.variable("batch_stats", "pop_var", jnp.ones, (D, F))

        def batch_moments():
            """Whole-batch (m, v_biased), cross-replica when ax is set.
            The single-device form keeps jnp.var's op order so existing
            numerics are untouched."""
            if not ax:
                return (
                    jnp.mean(x, axis=0, keepdims=True),
                    jnp.var(x, axis=0, keepdims=True),
                )
            m = gsum(jnp.sum(x, axis=0, keepdims=True)) / B_glob
            sq = gsum(jnp.sum(x * x, axis=0, keepdims=True)) / B_glob
            return m, jnp.maximum(sq - m * m, 0.0)

        if mask is None:
            # reference model/utils.py:609-611: plain non-affine batch norm.
            m, v = batch_moments()
            return (x - m) / jnp.sqrt(v + self.eps)

        mask = mask.astype(x.dtype)  # [B, D]
        if train:
            counts = gsum(jnp.sum(mask, axis=0))  # [D] global
            present = counts > 0
            safe = jnp.maximum(counts, 1.0)[:, None]  # [D, 1]
            dom_mean = gsum(jnp.einsum("bd,bf->df", mask, x)) / safe
            sq = gsum(jnp.einsum("bd,bf->df", mask, x * x)) / safe
            dom_var_biased = jnp.maximum(sq - dom_mean**2, 0.0)
            # unbiased for the EMA (torch Tensor.var default)
            denom = jnp.maximum(counts - 1.0, 1.0)[:, None]
            dom_var_unbiased = dom_var_biased * (safe / denom)

            new_mean = pop_mean.value * self.decay + dom_mean * (1.0 - self.decay)
            new_var = pop_var.value * self.decay + dom_var_unbiased * (1.0 - self.decay)
            keep = ~present[:, None]
            if not self.is_initializing():
                pop_mean.value = jnp.where(keep, pop_mean.value, new_mean)
                pop_var.value = jnp.where(keep, pop_var.value, new_var)

            if self.mode == "reference":
                m, v = batch_moments()  # [1, F]
                normed = (x[:, None, :] - m[:, None, :]) / jnp.sqrt(v[:, None, :] + self.eps)
            else:
                normed = (x[:, None, :] - dom_mean[None]) / jnp.sqrt(
                    dom_var_biased[None] + self.eps
                )
        else:
            normed = (x[:, None, :] - pop_mean.value[None]) / jnp.sqrt(
                pop_var.value[None] + self.eps
            )

        out = normed * gamma[None] + beta[None]  # [B, D, F]
        return jnp.einsum("bd,bdf->bf", mask, out)
