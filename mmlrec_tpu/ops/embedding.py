"""Embedding stores.

The reference keeps one tiny ``nn.Embedding`` per sparse feature in an
``nn.ModuleDict`` (model/utils.py:466-488) and performs one lookup per
feature in a Python loop (basemodel.py:475-477).  On TPU that is dozens of
small gathers.  Here all tables that share an embedding dim are *fused* into
a single ``[total_vocab, D]`` array with per-feature row offsets, so the
entire sparse side of a batch is ONE gather ``take(table, ids + offsets)``
— and the fused table's vocab dimension is the natural axis to shard over a
``model`` mesh axis (parallel/mesh.py); XLA then inserts the all-to-all /
all-gather collectives for the distributed lookup automatically.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..features import FeatureLayout
from .initializers import normal_init


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FusedEmbedding(nn.Module):
    """One table for many categorical features with a shared dim.

    vocab_sizes: per-feature vocabulary sizes, in sparse-slot order.
    dim: shared embedding dim.
    pad_to: total row count is rounded up so the vocab axis divides evenly
        across a model-parallel mesh axis (padding rows are never gathered).
    """

    vocab_sizes: Tuple[int, ...]
    dim: int
    init_std: float = 1e-4
    pad_to: int = 128

    def setup(self):
        offsets = np.concatenate([[0], np.cumsum(self.vocab_sizes)[:-1]]).astype(np.int32)
        self._offsets = jnp.asarray(offsets)
        total = int(sum(self.vocab_sizes))
        self._rows = _round_up(max(total, 1), self.pad_to)
        self.table = self.param(
            "table", normal_init(self.init_std), (self._rows, self.dim)
        )

    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        """ids: int32 [B, F] (per-feature local ids) -> [B, F, dim]."""
        flat_ids = ids + self._offsets[None, :]
        return jnp.take(self.table, flat_ids, axis=0)


class EmbeddingCollection(nn.Module):
    """Embedding bank for a FeatureLayout.

    Uses the fused path when every table shares one dim (true for all
    reference configs — ``model_config.emb`` is global); otherwise falls
    back to one parameter per embedding_name (still a single XLA gather per
    feature, no ModuleDict indirection).
    """

    layout: FeatureLayout
    init_std: float = 1e-4
    pad_to: int = 128

    def setup(self):
        sparse_names = [s.feature.embedding_name for s in self.layout.sparse_slots]
        sparse_dims = {self.layout.embedding_specs[n][1] for n in sparse_names}
        varlen_names = {s.feature.embedding_name for s in self.layout.varlen_slots}
        if len(sparse_dims) == 1 and sparse_names:
            vocabs = tuple(
                self.layout.embedding_specs[name][0] for name in sparse_names
            )
            self.fused = FusedEmbedding(
                vocab_sizes=vocabs,
                dim=sparse_dims.pop(),
                init_std=self.init_std,
                pad_to=self.pad_to,
            )
            # varlen features (and only those) get dedicated tables.
            table_names = varlen_names
        else:
            self.fused = None
            table_names = set(self.layout.embedding_specs)
        self.tables = {
            name: self.param(
                f"table_{name}",
                normal_init(self.init_std),
                self.layout.embedding_specs[name],
            )
            for name in sorted(table_names)
        }

    def sparse_embeddings(self, ids: jnp.ndarray) -> jnp.ndarray:
        """ids [B, n_sparse] -> [B, n_sparse, D] (uniform-dim fast path)."""
        if self.fused is not None:
            return self.fused(ids)
        outs = []
        for i, slot in enumerate(self.layout.sparse_slots):
            table = self.tables[slot.feature.embedding_name]
            outs.append(jnp.take(table, ids[:, i], axis=0))
        return jnp.stack(outs, axis=1)

    def varlen_embedding(self, name: str, seq_ids: jnp.ndarray) -> jnp.ndarray:
        """seq_ids [B, T] -> [B, T, D] for a VarLenSparseFeat."""
        return jnp.take(self.tables[name], seq_ids, axis=0)
