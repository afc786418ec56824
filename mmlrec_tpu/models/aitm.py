"""AITM (reference model/aitm.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layers import AITMAttention, StackedDense, StackedMLP
from .base import RecModel, overwrite


class AITM(RecModel):
    """Adaptive information transfer: per-task bottom DNNs; task i's feature
    fused with g(feat[i-1]) via 2-token attention (reference
    model/aitm.py:78-110; requires exactly 2 tasks, :31)."""

    # reference aitm.py:60-62 (tower_dnn), :71-75 (bottom +
    # tower_dnn_final_layer); the attention h1/h2/h3 and g transforms are
    # NOT registered
    REG_DNN_PREFIXES = ("bottom", "tower_dnn", "tower_final")

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc = self.mc
        T = self.num_tasks
        if T != 2:
            raise ValueError("the length of task_names must be equal to 2")
        embeddings = self._make_embeddings()
        dnn_input, _ = self.embed_inputs(embeddings, ids, dense)
        self.sow("intermediates", "dnn_input", dnn_input, reduce_fn=overwrite)
        bottom_units = mc.expert_dnn_hidden_units  # reference aitm.py:20

        feats = StackedMLP(
            stack=T,
            hidden_units=bottom_units,
            activation=mc.dnn_activation,
            dropout_rate=mc.dnn_dropout,
            use_bn=mc.dnn_use_bn,
            init_std=self.init_std,
            name="bottom",
        )(dnn_input, train=train)  # [B, T, F]

        dim = bottom_units[-1]
        feat_list = [feats[:, i] for i in range(T)]
        for i in range(1, T):
            p = nn.Dense(dim, name=f"g_{i-1}")(feat_list[i - 1])
            feat_list[i] = AITMAttention(dim=dim, name="attention")(p, feat_list[i])

        feats = jnp.stack(feat_list, axis=1)
        if len(mc.tower_dnn_hidden_units) > 0:
            tower = StackedMLP(
                stack=T,
                hidden_units=mc.tower_dnn_hidden_units,
                activation=mc.dnn_activation,
                dropout_rate=mc.dnn_dropout,
                use_bn=mc.dnn_use_bn,
                init_std=self.init_std,
                name="tower_dnn",
            )(feats, train=train)
        else:
            tower = feats
        logits = StackedDense(stack=T, features=1, use_bias=False,
                              name="tower_final")(tower)[..., 0]
        probs = self.make_heads()(logits + self.wide_logit(ids, dense))
        return self.apply_domain_mask(probs, domain_mask)
