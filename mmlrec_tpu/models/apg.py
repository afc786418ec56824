"""APG — adaptive parameter generation (reference model/apg.py)."""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.initializers import normal_init, torch_linear_bias_init, xavier_uniform_init
from ..ops.layers import StackedDense, activation_fn
from .base import RecModel, overwrite


class APGLayer(nn.Module):
    """MLP layer whose middle K x K block (+bias) is *generated per sample*
    from the detached scene embedding (reference APGLayer,
    model/apg.py:9-124).

    Implements the configuration the reference instantiates
    (use_uv_shared=True; model/apg.py:148-152 passes use_mf_p=False, mf_k=4):
        x @ W_nk -> bmm with generated [B, k, k] -> @ W_km
    plus the use_mf_p=True low-rank variant for API completeness.
    The generated [B,k,k] weight is contracted with a batched einsum; no
    [B,n,m] weight materialisation beyond the k x k block itself.
    """

    input_dim: int
    output_dim: int
    scene_emb_dim: int
    activation: Optional[str] = "relu"
    generate_activation: Optional[str] = None
    inner_activation: Optional[str] = None
    use_uv_shared: bool = True
    mf_k: int = 16
    use_mf_p: bool = True
    mf_p: int = 4
    init_std: float = 1e-4

    @nn.compact
    def __call__(self, x, scene_emb):
        min_dim = min(self.input_dim, self.output_dim)
        p_dim = math.ceil(min_dim / self.mf_p)
        k_dim = math.ceil(min_dim / self.mf_k)

        gen_act = activation_fn(self.generate_activation) if self.generate_activation else (lambda v: v)
        # generator nets are reference ``DNN``s with one layer -> kernel
        # normal(0, 1e-4), bias torch-default (model/apg.py:34-37).
        def gen(name, out):
            y = nn.Dense(
                out,
                kernel_init=normal_init(self.init_std),
                bias_init=torch_linear_bias_init(self.scene_emb_dim),
                name=name,
            )(scene_emb)
            return gen_act(y)

        w_kk = gen("specific_weight_kk", k_dim * k_dim).reshape(-1, k_dim, k_dim)
        b_kk = gen("specific_bias_kk", k_dim)

        inner = activation_fn(self.inner_activation) if self.inner_activation else (lambda v: v)
        shared = lambda name, shape: self.param(name, xavier_uniform_init(), shape)
        zeros = lambda name, shape: self.param(name, nn.initializers.zeros, shape)

        if self.use_uv_shared:
            if self.use_mf_p:
                out = inner(x @ shared("w_np", (self.input_dim, p_dim)) + zeros("b_np", (p_dim,)))
                out = inner(out @ shared("w_pk", (p_dim, k_dim)) + zeros("b_pk", (k_dim,)))
                out = inner(jnp.einsum("bk,bkj->bj", out, w_kk) + b_kk)
                out = inner(out @ shared("w_kp", (k_dim, p_dim)) + zeros("b_kp", (p_dim,)))
                out = out @ shared("w_pm", (p_dim, self.output_dim)) + zeros("b_pm", (self.output_dim,))
            else:
                out = inner(x @ shared("w_nk", (self.input_dim, k_dim)) + zeros("b_nk", (k_dim,)))
                out = inner(jnp.einsum("bk,bkj->bj", out, w_kk) + b_kk)
                out = out @ shared("w_km", (k_dim, self.output_dim)) + zeros("b_km", (self.output_dim,))
        else:
            w_nk = gen("specific_weight_nk", self.input_dim * k_dim).reshape(
                -1, self.input_dim, k_dim
            )
            b_nk = gen("specific_bias_nk", k_dim)
            w_km = gen("specific_weight_km", k_dim * self.output_dim).reshape(
                -1, k_dim, self.output_dim
            )
            b_km = gen("specific_bias_km", self.output_dim)
            out = inner(jnp.einsum("bi,bik->bk", x, w_nk) + b_nk)
            out = inner(jnp.einsum("bk,bkj->bj", out, w_kk) + b_kk)
            out = jnp.einsum("bk,bko->bo", out, w_km) + b_km

        if self.activation:
            out = activation_fn(self.activation)(out)
        return out


class APG(RecModel):
    """APG model (reference model/apg.py:128-193): stack of APGLayers fed by
    the detached scene embedding; per-task final linears."""

    # reference apg.py has NO add_regularization_weight call: only the
    # embeddings (basemodel.py:129) are L2-penalized
    REG_DNN_PREFIXES = ()

    @nn.compact
    def __call__(self, ids, dense, domain_mask=None, *, train: bool = False):
        mc, dc = self.mc, self.dc
        T = self.num_tasks
        embeddings = self._make_embeddings()
        dnn_input, sparse_emb = self.embed_inputs(embeddings, ids, dense)
        self.sow("intermediates", "dnn_input", dnn_input, reduce_fn=overwrite)

        scene_idx = self.layout.sparse_feature_index(dc.scene_feature)
        scene_emb = jax.lax.stop_gradient(sparse_emb[:, scene_idx])  # [B, emb]

        hidden_units = [self.input_dim] + list(mc.dnn_hidden_units)
        x = dnn_input
        for i in range(len(mc.dnn_hidden_units)):
            x = APGLayer(
                input_dim=hidden_units[i],
                output_dim=hidden_units[i + 1],
                scene_emb_dim=mc.emb,
                activation=mc.dnn_activation,
                use_uv_shared=True,
                use_mf_p=False,
                mf_k=4,
                mf_p=4,
                init_std=self.init_std,
                name=f"apg_layer_{i}",
            )(x, scene_emb)
            self.sow("intermediates", f"apg_output_{i}", x, reduce_fn=overwrite)
        self.sow("intermediates", "last_layer", x, reduce_fn=overwrite)

        logits = StackedDense(stack=T, features=1, use_bias=False,
                              name="final_layer")(x)[..., 0]
        probs = self.make_heads()(logits + self.wide_logit(ids, dense))
        return self.apply_domain_mask(probs, domain_mask)
