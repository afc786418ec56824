"""MMoE (reference model/mmoe.py)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layers import StackedDense, StackedMLP
from .base import RecModel, overwrite


class MMOE(RecModel):
    """Multi-gate mixture-of-experts (reference model/mmoe.py:8-119).

    The reference's expert loop (:71-75) and per-task gate/tower loops
    (:78-99) are one StackedMLP + einsum each here.
    """

    # reference mmoe.py:36-38 (gate_dnn), :49-51 (tower_dnn), :59-62
    # (expert_dnn + gate/tower final layers)
    REG_DNN_PREFIXES = ("gate_dnn", "tower_dnn", "expert_dnn",
                        "gate_final", "tower_final")

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc = self.mc
        embeddings = self._make_embeddings()
        dnn_input, _ = self.embed_inputs(embeddings, ids, dense)
        self.sow("intermediates", "dnn_input", dnn_input, reduce_fn=overwrite)

        expert_outs = StackedMLP(
            stack=mc.num_experts,
            hidden_units=mc.expert_dnn_hidden_units,
            activation=mc.dnn_activation,
            dropout_rate=mc.dnn_dropout,
            use_bn=mc.dnn_use_bn,
            init_std=self.init_std,
            name="expert_dnn",
        )(dnn_input, train=train)  # [B, E, dim]
        self.sow("intermediates", "expert_outputs", expert_outs, reduce_fn=overwrite)

        if len(mc.gate_dnn_hidden_units) > 0:
            gate_hidden = StackedMLP(
                stack=self.num_tasks,
                hidden_units=mc.gate_dnn_hidden_units,
                activation=mc.dnn_activation,
                dropout_rate=mc.dnn_dropout,
                use_bn=mc.dnn_use_bn,
                init_std=self.init_std,
                name="gate_dnn",
            )(dnn_input, train=train)  # [B, T, gh]
        else:
            gate_hidden = dnn_input
        gate_logits = StackedDense(
            stack=self.num_tasks, features=mc.num_experts, use_bias=False,
            name="gate_final",
        )(gate_hidden)  # [B, T, E]
        gates = jax.nn.softmax(gate_logits, axis=-1)
        self.sow("intermediates", "gate_outputs", gates, reduce_fn=overwrite)
        mmoe_outs = jnp.einsum("bte,bed->btd", gates, expert_outs)  # [B, T, dim]
        self.sow("intermediates", "mmoe_outputs", mmoe_outs, reduce_fn=overwrite)

        if len(mc.tower_dnn_hidden_units) > 0:
            tower = StackedMLP(
                stack=self.num_tasks,
                hidden_units=mc.tower_dnn_hidden_units,
                activation=mc.dnn_activation,
                dropout_rate=mc.dnn_dropout,
                use_bn=mc.dnn_use_bn,
                init_std=self.init_std,
                name="tower_dnn",
            )(mmoe_outs, train=train)
            self.sow("intermediates", "tower_outputs", tower, reduce_fn=overwrite)
        else:
            tower = mmoe_outs
        logits = StackedDense(
            stack=self.num_tasks, features=1, use_bias=False, name="tower_final"
        )(tower)[..., 0]
        probs = self.make_heads()(logits + self.wide_logit(ids, dense))
        return self.apply_domain_mask(probs, domain_mask)
