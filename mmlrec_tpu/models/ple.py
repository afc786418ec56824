"""PLE — progressive layered extraction (reference model/ple.py)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layers import MLP, StackedDense, StackedMLP
from .base import RecModel, overwrite


class PLE(RecModel):
    """num_levels CGC layers: per-task specific experts + shared experts;
    per-task gates see own+shared experts, the shared gate sees all
    (reference cgc_net model/ple.py:107-154, forward :156-198).

    Parity notes: the reference *builds* shared experts with
    ``specific_expert_num`` count but only *uses* the first
    ``shared_expert_num`` of them (model/ple.py:47-48 vs :120-122); we build
    exactly the used ``shared_expert_num`` experts (the extras are untrained
    dead parameters in the reference).
    """

    # reference ple.py:57-59 (specific_gate_dnn), :74-76 (shared_gate_dnn),
    # :89-91 (tower_dnn), :99-103 (specific/shared experts + all final layers)
    REG_DNN_PREFIXES = ("specific_gate_dnn", "shared_gate_dnn", "tower_dnn",
                        "specific_experts", "shared_experts",
                        "specific_gate_final", "shared_gate_final",
                        "tower_final")

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc = self.mc
        T = self.num_tasks
        spec = mc.specific_expert_num
        shared = mc.shared_expert_num
        embeddings = self._make_embeddings()
        dnn_input, _ = self.embed_inputs(embeddings, ids, dense)
        self.sow("intermediates", "dnn_input", dnn_input, reduce_fn=overwrite)

        mlp_kw = dict(
            activation=mc.dnn_activation,
            dropout_rate=mc.dnn_dropout,
            use_bn=mc.dnn_use_bn,
            init_std=self.init_std,
        )

        # inputs: [B, T+1, d]  (T task lanes + 1 shared lane), all equal to
        # dnn_input at level 0 (reference ple.py:162).
        inputs = jnp.broadcast_to(
            dnn_input[:, None, :], (dnn_input.shape[0], T + 1, dnn_input.shape[-1])
        )
        for level in range(mc.num_levels):
            spec_in = jnp.repeat(inputs[:, :T], spec, axis=1)  # [B, T*spec, d]
            spec_out = StackedMLP(
                stack=T * spec,
                hidden_units=mc.expert_dnn_hidden_units,
                name=f"specific_experts_{level}",
                **mlp_kw,
            )(spec_in, train=train)  # [B, T*spec, h]
            shared_in = jnp.repeat(inputs[:, T:], shared, axis=1)
            shared_out = StackedMLP(
                stack=shared,
                hidden_units=mc.expert_dnn_hidden_units,
                name=f"shared_experts_{level}",
                **mlp_kw,
            )(shared_in, train=train)  # [B, shared, h]

            B = dnn_input.shape[0]
            h = spec_out.shape[-1]

            # --- per-task gates (see own specific + shared experts) ---
            if len(mc.gate_dnn_hidden_units) > 0:
                gate_h = StackedMLP(
                    stack=T,
                    hidden_units=mc.gate_dnn_hidden_units,
                    name=f"specific_gate_dnn_{level}",
                    **mlp_kw,
                )(inputs[:, :T], train=train)
            else:
                gate_h = inputs[:, :T]
            gate = jax.nn.softmax(
                StackedDense(
                    stack=T, features=spec + shared, use_bias=False,
                    name=f"specific_gate_final_{level}",
                )(gate_h),
                axis=-1,
            )  # [B, T, spec+shared]
            per_task_experts = jnp.concatenate(
                [
                    spec_out.reshape(B, T, spec, h),
                    jnp.broadcast_to(shared_out[:, None], (B, T, shared, h)),
                ],
                axis=2,
            )  # [B, T, spec+shared, h]
            task_outs = jnp.einsum("bts,btsh->bth", gate, per_task_experts)

            # --- shared gate (sees all experts) ---
            if len(mc.gate_dnn_hidden_units) > 0:
                sgate_h = MLP(
                    mc.gate_dnn_hidden_units,
                    name=f"shared_gate_dnn_{level}",
                    **mlp_kw,
                )(inputs[:, T], train=train)
            else:
                sgate_h = inputs[:, T]
            sgate = jax.nn.softmax(
                nn.Dense(
                    T * spec + shared, use_bias=False,
                    name=f"shared_gate_final_{level}",
                )(sgate_h),
                axis=-1,
            )
            all_experts = jnp.concatenate([spec_out, shared_out], axis=1)
            shared_mix = jnp.einsum("bs,bsh->bh", sgate, all_experts)

            inputs = jnp.concatenate([task_outs, shared_mix[:, None]], axis=1)
            self.sow(
                "intermediates", f"ple_output_{level}", inputs, reduce_fn=overwrite
            )

        ple_outputs = inputs[:, :T]  # [B, T, h]
        if len(mc.tower_dnn_hidden_units) > 0:
            tower = StackedMLP(
                stack=T,
                hidden_units=mc.tower_dnn_hidden_units,
                name="tower_dnn",
                **mlp_kw,
            )(ple_outputs, train=train)
            self.sow("intermediates", "tower_outputs", tower, reduce_fn=overwrite)
        else:
            tower = ple_outputs
        logits = StackedDense(stack=T, features=1, use_bias=False,
                              name="tower_final")(tower)[..., 0]
        probs = self.make_heads()(logits + self.wide_logit(ids, dense))
        return self.apply_domain_mask(probs, domain_mask)
