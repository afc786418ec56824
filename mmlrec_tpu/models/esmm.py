"""ESMM and ESCM (reference model/esmm.py, model/escm.py)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layers import MLP
from .base import RecModel, overwrite


class ESMM(RecModel):
    """Entire-space multi-task model: parallel CTR & CVR towers; outputs
    [pCTR, pCTR*pCVR] (reference model/esmm.py:46-70).  Ignores domain_mask
    like the reference.  Both heads share ONE scalar output bias
    (reference uses the base class's single ``self.out``)."""

    # reference esmm.py:38-43: ctr/cvr DNNs + their final layers
    REG_DNN_PREFIXES = ("ctr_dnn", "cvr_dnn", "ctr_final", "cvr_final")

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc = self.mc
        embeddings = self._make_embeddings()
        dnn_input, _ = self.embed_inputs(embeddings, ids, dense)
        self.sow("intermediates", "dnn_input", dnn_input, reduce_fn=overwrite)

        def tower(name):
            h = MLP(
                mc.expert_dnn_hidden_units,
                activation=mc.dnn_activation,
                dropout_rate=mc.dnn_dropout,
                use_bn=mc.dnn_use_bn,
                init_std=self.init_std,
                name=f"{name}_dnn",
            )(dnn_input, train=train)
            return h, nn.Dense(1, use_bias=False, name=f"{name}_final")(h)[:, 0]

        ctr_h, ctr_logit = tower("ctr")
        cvr_h, cvr_logit = tower("cvr")
        self.sow("intermediates", "target0_output", ctr_h, reduce_fn=overwrite)
        self.sow("intermediates", "target1_output", cvr_h, reduce_fn=overwrite)

        bias = self.param("out_bias", nn.initializers.zeros, (1,))
        wide = self.wide_logit(ids, dense)
        wide = wide[:, 0] if not isinstance(wide, float) else wide
        ctr_pred = jax.nn.sigmoid(ctr_logit + bias[0] + wide)
        cvr_pred = jax.nn.sigmoid(cvr_logit + bias[0] + wide)
        return jnp.stack([ctr_pred, ctr_pred * cvr_pred], axis=-1)


class ESCM(RecModel):
    """ESCM^2: ESMM towers with outputs [pCTR, pCVR, pCTCVR] (+ pIMP for
    'escm_dr'); the IPW counterfactual CVR loss lives in
    train/losses.py (reference model/escm.py:74-111)."""

    # reference escm.py:66-71: ctr/cvr DNNs + their final layers (the
    # escm_dr imp tower is NOT registered in the reference either)
    REG_DNN_PREFIXES = ("ctr_dnn", "cvr_dnn", "ctr_final", "cvr_final")

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc = self.mc
        embeddings = self._make_embeddings()
        dnn_input, _ = self.embed_inputs(embeddings, ids, dense)
        self.sow("intermediates", "dnn_input", dnn_input, reduce_fn=overwrite)

        def tower(name):
            h = MLP(
                mc.expert_dnn_hidden_units,
                activation=mc.dnn_activation,
                dropout_rate=mc.dnn_dropout,
                use_bn=mc.dnn_use_bn,
                init_std=self.init_std,
                name=f"{name}_dnn",
            )(dnn_input, train=train)
            return nn.Dense(1, use_bias=False, name=f"{name}_final")(h)[:, 0]

        bias = self.param("out_bias", nn.initializers.zeros, (1,))
        wide = self.wide_logit(ids, dense)
        wide = wide[:, 0] if not isinstance(wide, float) else wide
        ctr_pred = jax.nn.sigmoid(tower("ctr") + bias[0] + wide)
        cvr_pred = jax.nn.sigmoid(tower("cvr") + bias[0] + wide)
        outs = [ctr_pred, cvr_pred, ctr_pred * cvr_pred]
        if mc.model_name == "escm_dr":
            outs.append(jax.nn.sigmoid(tower("imp") + bias[0] + wide))
        return jnp.stack(outs, axis=-1)
