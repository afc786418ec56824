"""SharedBottom (reference model/sharedbottom.py)."""

from __future__ import annotations

import flax.linen as nn

from ..ops.layers import MLP, StackedDense, StackedMLP
from .base import RecModel, overwrite


class SharedBottom(RecModel):
    """One shared bottom MLP -> per-task towers -> per-task 1-unit heads
    (reference model/sharedbottom.py:28-49, forward :52-86)."""

    # reference sharedbottom.py:36-49: tower_dnn + bottom_dnn +
    # tower_dnn_final_layer weights get l2_reg_dnn
    REG_DNN_PREFIXES = ("bottom_dnn", "tower_dnn", "tower_final")

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc = self.mc
        embeddings = self._make_embeddings()
        dnn_input, _ = self.embed_inputs(embeddings, ids, dense)
        self.sow("intermediates", "dnn_input", dnn_input, reduce_fn=overwrite)

        bottom = MLP(
            mc.bottom_dnn_hidden_units,
            activation=mc.dnn_activation,
            dropout_rate=mc.dnn_dropout,
            use_bn=mc.dnn_use_bn,
            init_std=self.init_std,
            name="bottom_dnn",
        )(dnn_input, train=train)
        self.sow("intermediates", "shared_bottom_outputs", bottom, reduce_fn=overwrite)

        if len(mc.tower_dnn_hidden_units) > 0:
            tower = StackedMLP(
                stack=self.num_tasks,
                hidden_units=mc.tower_dnn_hidden_units,
                activation=mc.dnn_activation,
                dropout_rate=mc.dnn_dropout,
                use_bn=mc.dnn_use_bn,
                init_std=self.init_std,
                name="tower_dnn",
            )(bottom, train=train)
            self.sow("intermediates", "tower_outputs", tower, reduce_fn=overwrite)
        else:
            tower = bottom
        logits = StackedDense(
            stack=self.num_tasks, features=1, use_bias=False, name="tower_final"
        )(tower)[..., 0]
        probs = self.make_heads()(logits + self.wide_logit(ids, dense))
        return self.apply_domain_mask(probs, domain_mask)
