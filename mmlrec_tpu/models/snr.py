"""SNR and MSSM (reference model/snr_trans.py, model/mssm.py).

Both alternate expert layers with learned routing layers; SNR's gate scales
each (out, in) connection by a scalar hard-concrete z, MSSM's gate is
per-feature (field-level sparse sharing).  The per-pair matmul loops
(snr_trans.py:45-50, mssm.py:53-58) are a single 4-D einsum here (SNRGate).

Reference bug reproduction (SURVEY §2.4.2): SNR leaves ``trans_matrix`` in
nested Python lists (unregistered -> frozen); MSSM additionally leaves ``u``
unregistered.  ``model_config.ref_faithful_frozen_params`` replays this via
stop_gradient.
"""

from __future__ import annotations

import flax.linen as nn

from ..ops.layers import SNRGate, StackedDense, StackedMLP
from .base import RecModel, overwrite


class _SNRBase(RecModel):
    elementwise: bool = False
    freeze_u: bool = False

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc = self.mc
        T = self.num_tasks
        E = mc.num_experts
        if T <= 1:
            raise ValueError("num_tasks must be greater than 1")
        if E <= 1:
            raise ValueError("num_experts must be greater than 1")
        embeddings = self._make_embeddings()
        dnn_input, _ = self.embed_inputs(embeddings, ids, dense)
        self.sow("intermediates", "dnn_input", dnn_input, reduce_fn=overwrite)

        units = list(mc.expert_dnn_hidden_units)
        n_levels = len(units)
        freeze = mc.ref_faithful_frozen_params

        x = dnn_input  # rank 2 at level 0 -> broadcast to experts
        for i in range(n_levels):
            x = StackedMLP(
                stack=E,
                hidden_units=[units[i]],
                activation=mc.dnn_activation,
                dropout_rate=mc.dnn_dropout,
                use_bn=mc.dnn_use_bn,
                init_std=self.init_std,
                name=f"trans_{i + 1}",
            )(x, train=train)  # [B, E, units[i]]
            out_dim = T if i == n_levels - 1 else E
            x = SNRGate(
                input_dim=E,
                output_dim=out_dim,
                units=units[i],
                elementwise=self.elementwise,
                freeze_trans_ref_faithful=freeze,
                freeze_u_ref_faithful=freeze and self.freeze_u,
                stochastic=bool(mc.extra.get("snr_stochastic_gates")),
                # "per_connection" = learnable per-connection keep-rate
                # (Louizos-style L0); the scalar default is the reference's
                # torch.rand(1) alpha (snr_trans.py:13).  See SNRGate.
                per_connection_alpha=(
                    mc.extra.get("snr_gate_alpha", "scalar")
                    == "per_connection"),
                # open-gate init (round 5): start at the no-gates ceiling
                # and let the L0 machinery prune — fixes the mssm MTL
                # patience-3 takeoff race (see SNRGate.open_init_alpha)
                open_init_alpha=mc.extra.get("snr_gate_open_init"),
                name=f"gate_{i + 1}",
            )(x, train=train)  # [B, out_dim, units[i]]

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
        else:
            tower = x
        logits = StackedDense(stack=T, features=1, use_bias=False,
                              name="tower_final")(tower)[..., 0]
        probs = self.make_heads()(logits + self.wide_logit(ids, dense))
        return self.apply_domain_mask(probs, domain_mask)


class SNRTrans(_SNRBase):
    """SNR with transform routing (reference model/snr_trans.py:52-157)."""

    # reference snr_trans.py:108-110: ONLY the tower DNN gets l2_reg_dnn
    # (expert trans layers, gates, and final layers are not registered)
    REG_DNN_PREFIXES = ("tower_dnn",)

    elementwise: bool = False
    freeze_u: bool = False  # SNR registers u + alpha (only trans is frozen)


class MSSM(_SNRBase):
    """MSSM: field-level sparse sharing (reference model/mssm.py:62-180)."""

    # reference mssm.py:129-131: ONLY the tower DNN gets l2_reg_dnn
    REG_DNN_PREFIXES = ("tower_dnn",)

    elementwise: bool = True
    freeze_u: bool = True  # reference MSSM registers neither u nor trans
