"""Cross-stitch network (reference model/cross_stitch.py)."""

from __future__ import annotations

import flax.linen as nn

from ..ops.layers import CrossStitchLayer, MLP, StackedDense, StackedMLP
from .base import RecModel, overwrite


class CrossStitch(RecModel):
    """Shared first layer, then per-task DNN columns with a learned
    cross-stitch mixing matrix between layers (reference
    model/cross_stitch.py:30-121)."""

    # reference cross_stitch.py:70-72: ONLY the tower DNN is registered;
    # shared/task layers, cross-stitch matrices and the final layers are not
    REG_DNN_PREFIXES = ("tower_dnn",)

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc = self.mc
        T = self.num_tasks
        embeddings = self._make_embeddings()
        dnn_input, _ = self.embed_inputs(embeddings, ids, dense)
        self.sow("intermediates", "dnn_input", dnn_input, reduce_fn=overwrite)

        shared = MLP(
            [mc.shared_hidden_unit],
            activation=mc.dnn_activation,
            dropout_rate=mc.dnn_dropout,
            use_bn=mc.dnn_use_bn,
            init_std=self.init_std,
            name="shared_layer",
        )(dnn_input, train=train)  # [B, shared]

        x = shared  # broadcast to all task columns by StackedMLP rank-2 input
        for i, units in enumerate(mc.dnn_hidden_units):
            x = StackedMLP(
                stack=T,
                hidden_units=[units],
                activation=mc.dnn_activation,
                dropout_rate=mc.dnn_dropout,
                use_bn=mc.dnn_use_bn,
                init_std=self.init_std,
                name=f"task_layer_{i}",
            )(x, train=train)  # [B, T, units]
            x = CrossStitchLayer(name=f"gate_{i}")(x)
        self.sow("intermediates", "cross_stitch_outputs", x, reduce_fn=overwrite)

        if len(mc.tower_dnn_hidden_units) > 0:
            tower = StackedMLP(
                stack=T,
                hidden_units=mc.tower_dnn_hidden_units,
                activation=mc.dnn_activation,
                dropout_rate=mc.dnn_dropout,
                use_bn=mc.dnn_use_bn,
                init_std=self.init_std,
                name="tower_dnn",
            )(x, train=train)
            self.sow("intermediates", "tower_outputs", tower, reduce_fn=overwrite)
        else:
            tower = x
        logits = StackedDense(stack=T, features=1, use_bias=False,
                              name="tower_final")(tower)[..., 0]
        probs = self.make_heads()(logits + self.wide_logit(ids, dense))
        return self.apply_domain_mask(probs, domain_mask)
