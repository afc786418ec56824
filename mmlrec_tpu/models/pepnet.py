"""PEPNet (reference model/pepnet.py)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layers import GateNN, StackedDense, activation_fn
from .base import RecModel, overwrite


class _StackedGateNN(nn.Module):
    """T parallel GateNNs as stacked einsums (reference GateNN
    model/pepnet.py:8-32, instantiated per task per layer :64-68)."""

    stack: int
    output_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        # x: [B, G] broadcast to every task's gate
        h = StackedDense(stack=self.stack, features=self.hidden_dim,
                         name="dense_0")(x)
        h = jax.nn.relu(h)
        h = StackedDense(stack=self.stack, features=self.output_dim,
                         name="dense_1")(h)
        return 2.0 * jax.nn.sigmoid(h)  # [B, T, output_dim]


class PepNet(RecModel):
    """EPNet feature gate rescales the input; PPNet per-task MLP with every
    layer element-gated by GateNN(detached input ++ scene/user/item embs)
    (reference model/pepnet.py:81-157)."""

    # reference pepnet.py has NO add_regularization_weight call: only the
    # embeddings (basemodel.py:129) are L2-penalized
    REG_DNN_PREFIXES = ()

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc, dc = self.mc, self.dc
        T = self.num_tasks
        embeddings = self._make_embeddings()
        dnn_input, sparse_emb = self.embed_inputs(embeddings, ids, dense)
        self.sow("intermediates", "dnn_input", dnn_input, reduce_fn=overwrite)

        def sf_emb(col):
            idx = self.layout.sparse_feature_index(col)
            return jax.lax.stop_gradient(sparse_emb[:, idx])

        scene_emb = sf_emb(dc.scene_feature)
        sf_parts = [scene_emb]
        if dc.user_sf and dc.item_sf:
            sf_parts = [scene_emb, sf_emb(dc.user_sf), sf_emb(dc.item_sf)]
        task_sf_emb = jnp.concatenate(sf_parts, axis=-1)

        # EPNet (reference :110, :139-140)
        feature_gate = GateNN(
            output_dim=self.input_dim, hidden_dim=128, name="feature_gate"
        )(jnp.concatenate([jax.lax.stop_gradient(dnn_input), scene_emb], axis=-1),
          train=train)
        gated_input = feature_gate * dnn_input

        # PPNet (reference PPNetBlock :34-78): per-layer per-task gates.
        gate_input = jnp.concatenate(
            [jax.lax.stop_gradient(gated_input), task_sf_emb], axis=-1
        )
        hidden_units = [self.input_dim] + list(mc.dnn_hidden_units)
        act = activation_fn("relu")
        hidden = gated_input  # [B, in]; becomes [B, T, h] after first layer
        for i in range(len(hidden_units) - 1):
            gw = _StackedGateNN(
                stack=T,
                output_dim=hidden_units[i],
                hidden_dim=hidden_units[i],
                name=f"gate_{i}",
            )(gate_input)  # [B, T, h_i]
            gated = hidden * gw if hidden.ndim == 3 else hidden[:, None, :] * gw
            hidden = StackedDense(
                stack=T, features=hidden_units[i + 1], name=f"mlp_{i}"
            )(gated)
            hidden = act(hidden)
            if mc.dnn_dropout > 0:
                hidden = nn.Dropout(rate=mc.dnn_dropout, deterministic=not train)(hidden)
        gw = _StackedGateNN(
            stack=T,
            output_dim=hidden_units[-1],
            hidden_dim=hidden_units[-1],
            name=f"gate_{len(hidden_units) - 1}",
        )(gate_input)
        gated = hidden * gw if hidden.ndim == 3 else hidden[:, None, :] * gw
        logits = StackedDense(stack=T, features=1, name="mlp_final")(gated)[..., 0]

        probs = self.make_heads()(logits + self.wide_logit(ids, dense))
        return self.apply_domain_mask(probs, domain_mask)
