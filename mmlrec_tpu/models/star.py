"""STAR (reference model/star.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.domain_norm import DomainBatchNorm
from ..ops.layers import SharedSpecificDense, activation_fn
from .base import RecModel, overwrite


class STAR(RecModel):
    """Star topology FCN: each layer weight = domain-specific (x) shared
    (reference model/star.py:26-37, forward :39-80).  The reference's
    per-domain Python loop (:45-54) is one [B, D, ...] einsum pathway here.

    ``num_tasks`` doubles as the domain/pathway count (reference :27 uses
    self.num_tasks for SharedSpecificLinear's num_domains).  The optional
    DomainBatchNorm after layer 0 (:50-51) is applied per pathway; note the
    reference's runtime never reaches it during training because
    domain_mask is nulled by the always-true-conditional bug (SURVEY §2.4.1).
    """

    # reference star.py has NO add_regularization_weight call: only the
    # embeddings (basemodel.py:129) are L2-penalized
    REG_DNN_PREFIXES = ()

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc = self.mc
        T = self.num_tasks
        embeddings = self._make_embeddings()
        dnn_input, _ = self.embed_inputs(embeddings, ids, dense)
        self.sow("intermediates", "dnn_input", dnn_input, reduce_fn=overwrite)

        act = activation_fn(mc.dnn_activation)
        freeze = mc.ref_faithful_frozen_params
        x = dnn_input  # rank 2 -> SharedSpecificDense broadcasts to [B, T, h]
        use_dbn = (
            mc.dnn_use_bn
            and domain_mask is not None
            and domain_mask.shape[-1] == T
        )
        dbn = (
            DomainBatchNorm(
                num_features=mc.dnn_hidden_units[0],
                num_domains=T,
                mode=mc.domain_bn_mode,
                name="domain_bn",
            )
            if mc.dnn_use_bn and len(mc.dnn_hidden_units) > 0
            else None
        )
        for j, units in enumerate(mc.dnn_hidden_units):
            x = SharedSpecificDense(
                num_domains=T,
                features=units,
                use_shared=mc.use_shared,
                freeze_ref_faithful=freeze,
                name=f"linear_{j}",
            )(x)  # [B, T, units]
            x = act(x)
            if j == 0 and use_dbn and dbn is not None:
                # reference applies the (shared) DomainBatchNorm to each
                # pathway in its per-domain loop (star.py:50-51)
                pathways = [dbn(x[:, d], domain_mask, train=train) for d in range(T)]
                x = jnp.stack(pathways, axis=1)
            self.sow("intermediates", f"star_output_{j}", x, reduce_fn=overwrite)

        logits = []
        for i in range(T):
            out_i = SharedSpecificDense(
                num_domains=T,
                features=1,
                use_shared=mc.use_shared,
                freeze_ref_faithful=freeze,
                name=f"final_{i}",
            )(x[:, i])  # [B, T, 1]; reference uses index i of final layer i
            logits.append(out_i[:, i, 0])
        logits = jnp.stack(logits, axis=-1)
        self.sow("intermediates", "last_layer", x[:, -1], reduce_fn=overwrite)
        probs = self.make_heads()(logits + self.wide_logit(ids, dense))
        return self.apply_domain_mask(probs, domain_mask)
