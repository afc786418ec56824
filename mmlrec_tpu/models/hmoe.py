"""HMoE (reference model/hmoe.py)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layers import StackedDense, StackedMLP
from .base import RecModel, overwrite


class HMOE(RecModel):
    """MMoE backbone + per-task softmax weighting over ALL tasks' tower
    outputs, other tasks detached (reference model/hmoe.py:108-133)."""

    # reference hmoe.py:39-41 (gate_dnn), :51-53 (tower_dnn), :61-63
    # (task_weight), :77-80 (expert_dnn + gate/task_weight/tower finals)
    REG_DNN_PREFIXES = ("gate_dnn", "tower_dnn", "task_weight", "expert_dnn",
                        "gate_final", "tower_final", "task_weight_final")

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc = self.mc
        T = self.num_tasks
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
        )(dnn_input, train=train)
        self.sow("intermediates", "expert_outputs", expert_outs, reduce_fn=overwrite)

        if len(mc.gate_dnn_hidden_units) > 0:
            gate_hidden = StackedMLP(
                stack=T,
                hidden_units=mc.gate_dnn_hidden_units,
                activation=mc.dnn_activation,
                dropout_rate=mc.dnn_dropout,
                use_bn=mc.dnn_use_bn,
                init_std=self.init_std,
                name="gate_dnn",
            )(dnn_input, train=train)
        else:
            gate_hidden = dnn_input
        gates = jax.nn.softmax(
            StackedDense(stack=T, features=mc.num_experts, use_bias=False,
                         name="gate_final")(gate_hidden),
            axis=-1,
        )
        self.sow("intermediates", "gate_outputs", gates, reduce_fn=overwrite)
        mmoe_outs = jnp.einsum("bte,bed->btd", gates, expert_outs)
        self.sow("intermediates", "mmoe_outputs", mmoe_outs, reduce_fn=overwrite)

        # per-task softmax over tasks (reference task_weight nets :109-116)
        if len(mc.task_weight_hidden_units) > 0:
            tw_hidden = StackedMLP(
                stack=T,
                hidden_units=mc.task_weight_hidden_units,
                activation=mc.dnn_activation,
                dropout_rate=mc.dnn_dropout,
                use_bn=mc.dnn_use_bn,
                init_std=self.init_std,
                name="task_weight",
            )(dnn_input, train=train)
        else:
            tw_hidden = dnn_input
        task_weights = jax.nn.softmax(
            StackedDense(stack=T, features=T, use_bias=False,
                         name="task_weight_final")(tw_hidden),
            axis=-1,
        )  # [B, T, T] — weights[:, i, j] = task i's weight on task j's tower

        if len(mc.tower_dnn_hidden_units) > 0:
            towers = StackedMLP(
                stack=T,
                hidden_units=mc.tower_dnn_hidden_units,
                activation=mc.dnn_activation,
                dropout_rate=mc.dnn_dropout,
                use_bn=mc.dnn_use_bn,
                init_std=self.init_std,
                name="tower_dnn",
            )(mmoe_outs, train=train)
        else:
            towers = mmoe_outs
        self.sow("intermediates", "tower_outputs", towers, reduce_fn=overwrite)

        # task i mixes its own tower (grad flows) with detached other towers
        # (reference model/hmoe.py:126-132).
        towers_sg = jax.lax.stop_gradient(towers)
        eye = jnp.eye(T, dtype=towers.dtype)  # [T, J]: 1 where j == own task
        own_w = jnp.einsum("btj,tj->bt", task_weights, eye)  # task_weights[b,t,t]
        own = own_w[..., None] * towers
        others = jnp.einsum("btj,bjd->btd", task_weights * (1.0 - eye)[None], towers_sg)
        task_inputs = own + others  # [B, T, d]

        logits = StackedDense(stack=T, features=1, use_bias=False,
                              name="tower_final")(task_inputs)[..., 0]
        probs = self.make_heads()(logits + self.wide_logit(ids, dense))
        return self.apply_domain_mask(probs, domain_mask)
