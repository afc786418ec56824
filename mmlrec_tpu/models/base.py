"""Model base: embedding front-end + multi-head epilogue.

Equivalent surface to the reference's ``BaseModel`` (model/basemodel.py:69-650)
minus the training loop, which lives in train/trainer.py.  Every model is a
flax module called as::

    probs = model.apply(variables, ids, dense, domain_mask, train=...)

with ``ids: int32 [B, n_sparse]``, ``dense: float32 [B, n_dense]``,
``domain_mask: [B, D] or None`` and output ``[B, num_tasks]`` probabilities
(reference forward contract, e.g. model/mmoe.py:65-119).

The never-invoked wide/linear term (reference basemodel.py:14-66; all models
pass ``linear_feature_columns=[]``) is intentionally not replicated.
"""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import ExperimentConfig
from ..features import FeatureLayout
from ..ops.embedding import EmbeddingCollection
from ..ops.layers import PredictionHeads, WideLinear, sequence_pooling


def overwrite(prev, new):
    """sow() reducer keeping only the latest value."""
    return new


class RecModel(nn.Module):
    """Base for all 14 model families."""

    layout: FeatureLayout
    cfg: ExperimentConfig
    init_std: float = 1e-4

    # Per-model ``l2_reg_dnn`` inclusion set, mirroring the reference's
    # idiosyncratic add_regularization_weight registrations (see
    # train/losses.py::l2_regularization).  Top-level param-group name
    # prefixes whose ``kernel`` leaves are penalized.  The default ()
    # means embeddings-only — the reference's STAR/APG/PepNet register no
    # DNN weights at all (no add_regularization_weight call in
    # model/star.py, model/apg.py, model/pepnet.py).
    REG_DNN_PREFIXES: ClassVar[Tuple[str, ...]] = ()

    # ---- config shortcuts -------------------------------------------------
    @property
    def mc(self):
        return self.cfg.model_config

    @property
    def dc(self):
        return self.cfg.data_config

    @property
    def task_name(self) -> str:
        return self.mc.task_name

    @property
    def num_tasks(self) -> int:
        return self.cfg.num_tasks

    @property
    def num_domains(self) -> int:
        return self.dc.num_domains

    @property
    def task_types(self) -> Tuple[str, ...]:
        # reference basemodel.py:95 + per-regime num_tasks (:96-102); MSL
        # configs list task_types explicitly when D != 2.
        tt = tuple(self.mc.task_types)
        if len(tt) != self.num_tasks:
            tt = tuple(["binary"] * self.num_tasks)
        return tt

    @property
    def input_dim(self) -> int:
        return self.layout.input_dim

    # ---- shared submodules ------------------------------------------------
    def _make_embeddings(self) -> EmbeddingCollection:
        return EmbeddingCollection(
            layout=self.layout,
            init_std=self.init_std,
            grad_mode=str(self.mc.extra.get("embedding_grad", "auto")),
            # stack width of a vmapped suite (train/multi_seed.py sets it):
            # scales the matmul-grad one-hot budget to the REAL transient
            # memory, S one-hots materializing at once under vmap
            grad_budget_divisor=int(self.mc.extra.get("_grad_budget_div", 1)),
            # "stacked": fold the two-phase moment container into the table
            # param for single-strided-DMA row updates (ops/embedding.py
            # FusedEmbedding.dual_container; trainer validates the combo)
            dual_container=(
                str(self.mc.extra.get("table_container", "split")) == "stacked"
            ),
            # shard-major stacked layout on an explicit-collective mesh
            # (round 5): set stacked_shards = the mesh's 'model' axis size
            # BEFORE building the model (the trainer validates consistency)
            dual_shards=int(self.mc.extra.get("stacked_shards", 1) or 1),
            name="embeddings",
        )

    def embed_inputs(self, embeddings, ids, dense):
        """Return (dnn_input [B, input_dim], sparse_emb [B, F, D_emb]).

        Mirrors input_from_feature_columns + combined_dnn_input
        (reference basemodel.py:461-487, model/utils.py:434-446): flattened
        sparse embeddings ++ pooled varlen embeddings ++ dense values.
        """
        parts = []
        sparse_emb = None
        if self.layout.sparse_slots:
            sparse_emb = embeddings.sparse_embeddings(ids[:, : len(self.layout.sparse_slots)])
            parts.append(sparse_emb.reshape(sparse_emb.shape[0], -1))
        for slot in self.layout.varlen_slots:
            seq_ids = ids[:, slot.start : slot.end]
            seq_emb = embeddings.varlen_embedding(slot.feature.embedding_name, seq_ids)
            if slot.length_slot is not None:
                lengths = ids[:, slot.length_slot]
                mask = (
                    jnp.arange(slot.feature.maxlen)[None, :] < lengths[:, None]
                )
            else:
                mask = seq_ids != 0  # reference model/utils.py:454
            parts.append(sequence_pooling(seq_emb, mask, mode=slot.feature.combiner))
        if self.layout.num_dense_dims:
            parts.append(dense)
        if not parts:
            raise ValueError("dnn_feature_columns is null!")
        return jnp.concatenate(parts, axis=-1), sparse_emb

    def make_heads(self) -> PredictionHeads:
        return PredictionHeads(task_types=self.task_types, name="out")

    def wide_logit(self, ids, dense):
        """Opt-in wide/linear term (reference ``Linear``, basemodel.py:14-66
        — dead code there: constructed but never invoked, and every model
        passes ``linear_feature_columns=[]``).  With ``model_config
        .use_wide_linear: true`` this returns a [B, 1] LR logit added to
        every head pre-sigmoid; otherwise 0.0 so call sites can add it
        unconditionally."""
        if not self.mc.extra.get("use_wide_linear"):
            return 0.0
        # dedupe by embedding_name (reference Linear keys its 1-dim tables by
        # embedding_name, so features sharing a table share wide weights) and
        # take each slot's ids column from the layout rather than position
        names: list = []
        slot_tables = []
        for s in self.layout.sparse_slots:
            n = s.feature.embedding_name
            if n not in names:
                names.append(n)
            slot_tables.append(names.index(n))
        return WideLinear(
            vocab_sizes=tuple(
                self.layout.embedding_specs[n][0] for n in names
            ),
            n_dense=self.layout.num_dense_dims,
            init_std=self.init_std,
            slot_tables=tuple(slot_tables),
            slot_cols=tuple(s.start for s in self.layout.sparse_slots),
            name="wide_linear",
        )(ids, dense)

    def apply_domain_mask(self, probs: jnp.ndarray, domain_mask) -> jnp.ndarray:
        """Per-head domain gating (reference epilogue, e.g. model/mmoe.py:101-106).

        msl: head i gated by domain i; mtmsl: head i by domain i % D.
        No-op when domain_mask is None (the reference's effective runtime
        path, SURVEY §2.4.1).
        """
        if domain_mask is None:
            return probs
        if self.task_name == "msl":
            return probs * domain_mask
        if self.task_name == "mtmsl":
            idx = jnp.arange(probs.shape[-1]) % self.num_domains
            return probs * jnp.take(domain_mask, idx, axis=1)
        return probs
