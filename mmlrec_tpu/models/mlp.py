"""Fully-shared MLP (reference model/mlp.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layers import MLP as MLPStack
from .base import RecModel, overwrite


class MLP(RecModel):
    """Single MLP + ONE shared final layer; every task head emits the same
    logit, differing only in per-task output bias (reference
    model/mlp.py:24-29, forward :36-66).  Stashes dnn_input / last_layer for
    the CKA loss (reference :40, :47)."""

    # reference mlp.py:31-33: only mlp_layers weights (NOT the shared
    # final layer) get l2_reg_dnn
    REG_DNN_PREFIXES = ("mlp_layer_",)

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc = self.mc
        embeddings = self._make_embeddings()
        dnn_input, _ = self.embed_inputs(embeddings, ids, dense)
        self.sow("intermediates", "dnn_input", dnn_input, reduce_fn=overwrite)

        x = dnn_input
        for i, units in enumerate(mc.dnn_hidden_units):
            x = MLPStack(
                [units],
                activation="relu",
                init_std=self.init_std,
                name=f"mlp_layer_{i}",
            )(x, train=train)
            self.sow("intermediates", f"mlp_output_{i}", x, reduce_fn=overwrite)
        self.sow("intermediates", "last_layer", x, reduce_fn=overwrite)

        logit = nn.Dense(1, use_bias=False, name="final_layer")(x)  # [B, 1]
        logits = jnp.broadcast_to(logit, (logit.shape[0], self.num_tasks))
        probs = self.make_heads()(logits + self.wide_logit(ids, dense))
        return self.apply_domain_mask(probs, domain_mask)
