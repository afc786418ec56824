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

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..features import FeatureLayout
from .initializers import normal_init


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _padded_normal_init(std: float, total_logical: int, pack_factor: int, dim: int):
    """normal(std) for the real vocab rows, EXACT ZERO for padding rows.

    Padding rows are never gathered, so zero-init keeps them zero forever
    (their grad is identically 0; the dense-Adam L2 term is 2*l2*0).  This
    matters for L2 parity: the reference regularizes sum-of-squares over the
    exact per-feature tables (basemodel.py:129), so randomly-initialized pad
    rows would inflate the embedding penalty by rows_padded/rows_real
    (caught by tests/test_loss_parity.py).  Real rows draw the SAME normals
    as a plain normal_init with the same key, so transplant parity tests are
    unaffected.
    """

    def init(key, shape, dtype=jnp.float32):
        x = jax.random.normal(key, shape, dtype) * std
        if pack_factor == 1:
            mask = (jnp.arange(shape[0]) < total_logical)[:, None]
        else:
            logical = (
                jnp.arange(shape[0])[:, None] * pack_factor
                + (jnp.arange(shape[1]) // dim)[None, :]
            )
            mask = logical < total_logical
        return jnp.where(mask, x, jnp.zeros((), dtype))

    return init


def pack_factor_for(
    total_rows: int,
    dim: int,
    *,
    pad_to: int = 128,
    pack_lanes: int = 128,
    pack_min_rows: int = 1 << 18,
    packed: bool | None = None,
) -> int:
    """Logical rows per physical table row (1 = unpacked).

    Single source of truth for the lane-packing decision so the trainer's
    row-sparse update path (train/trainer.py) agrees with FusedEmbedding's
    parameter layout.
    """
    rows = _round_up(max(total_rows, 1), pad_to)
    packable = dim < pack_lanes and pack_lanes % dim == 0
    use_pack = (
        packable and rows >= pack_min_rows if packed is None else packed and packable
    )
    return pack_lanes // dim if use_pack else 1


def fused_table_geometry(layout):
    """(dim, pack_factor, physical_rows) of the fused table a FeatureLayout
    would build, or None when no fused path exists (non-uniform embedding
    dims or varlen features).  Single source of truth shared by
    FusedEmbedding.setup, the Trainer's table-update resolution, and
    resolve_table_container — so config-time and fit-time decisions cannot
    drift (ADVICE r3)."""
    if getattr(layout, "varlen_slots", None):
        return None
    dims = {int(s.feature.embedding_dim) for s in layout.sparse_slots}
    if len(dims) != 1:
        return None
    dim = dims.pop()
    total = int(sum(s.feature.vocabulary_size for s in layout.sparse_slots))
    P = pack_factor_for(total, dim)
    rows = _round_up(max(total, 1), 128)
    if P > 1:
        rows = _round_up(rows, P * 128)
    return dim, P, rows // P


#: one-hot budget for the matmul-backward lookup: f32 [B, F, vmax] bytes.
#: Break-even vs the scatter cotangent is vmax ~ 5000 (one-hot HBM bytes/row
#: vmax*4B at ~819 GB/s vs ~28 ns/row scatter), so the cap is about MEMORY,
#: not speed: batch_scaling.py measured B=16384 falling off a 12M -> 5M
#: examples/s cliff when the flagship's 105 MB one-hot exceeded the old
#: 64 MB cap and the path fell back to scatter.
MATMUL_GRAD_BUDGET_BYTES = 128 << 20


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def take_rows_matmul_grad(table, ids_local, vocab_sizes, vmax):
    """``take(table, local_ids + offsets)`` whose BACKWARD is a one-hot
    einsum (MXU matmul) instead of XLA's scatter-add.

    The scanned stage decomposition of the flagship step
    (benchmarks/probe_flagship_stages.py --scan) pins the backward pass at
    ~735 us of the 841 us device time while forward+loss is ~7 us; the
    culprit is the [B*F]-row scatter-add cotangent of ``jnp.take``, which
    this backend runs at per-row cost (~28 ns/row; docs/perf_notes.md
    "Scatter cost isolation").  For small fused tables the cotangent is
    instead computed as ``g_block[s] = onehot(ids[:, s])^T @ g[:, s]`` per
    feature — pure MXU work (B*F*vmax*D*2 flops ~ 0.1 GFLOP at flagship
    shapes) — and the per-feature blocks concatenate to the [V, D] table
    cotangent because fused blocks are contiguous and disjoint.

    Numerics: forward is bit-identical (same ``take``); the gradient is an
    f32 matmul reduction over the batch instead of scatter-add order, equal
    to f32 rounding (~4e-6 at flagship scale).
    """
    offs = np.concatenate([[0], np.cumsum(vocab_sizes)[:-1]]).astype(np.int32)
    return jnp.take(table, ids_local + jnp.asarray(offs)[None, :], axis=0)


def _take_rows_mm_fwd(table, ids_local, vocab_sizes, vmax):
    out = take_rows_matmul_grad(table, ids_local, vocab_sizes, vmax)
    return out, (ids_local, table.shape)


def _take_rows_mm_bwd(vocab_sizes, vmax, res, g):
    ids_local, tshape = res
    oh = jax.nn.one_hot(ids_local, vmax, dtype=g.dtype)  # [B, F, vmax]
    gb = jnp.einsum("bsv,bsd->svd", oh, g)  # [F, vmax, D]
    blocks = [gb[s, :v] for s, v in enumerate(vocab_sizes)]
    pad = tshape[0] - sum(vocab_sizes)
    if pad:
        blocks.append(jnp.zeros((pad, tshape[1]), g.dtype))
    return (
        jnp.concatenate(blocks, axis=0),
        np.zeros(ids_local.shape, jax.dtypes.float0),
    )


take_rows_matmul_grad.defvjp(_take_rows_mm_fwd, _take_rows_mm_bwd)


class FusedEmbedding(nn.Module):
    """One table for many categorical features with a shared dim.

    vocab_sizes: per-feature vocabulary sizes, in sparse-slot order.
    dim: shared embedding dim.
    pad_to: total row count is rounded up so the vocab axis divides evenly
        across a model-parallel mesh axis (padding rows are never gathered).

    Large tables are stored *lane-packed*: ``pack_factor = 128 // dim``
    logical rows per physical ``[rows/P, 128]`` row.  Measured on v5e
    (docs/perf_notes.md "Packed gather"): XLA's row gather hits its fast DMA
    path only when rows span >= 128 f32 lanes (~17 ns/row, vs a ~2.9 GB/s
    elementwise path for narrow rows that scales with dim).  Gathering the
    super-row and selecting the sub-row with a tiny one-hot einsum is
    2.4-2.6x faster forward and 1.7-3.7x faster backward at >= 1M rows,
    bit-exact, with zero extra memory.  Tiny tables (< pack_min_rows) keep
    the plain layout (packing is a slight loss when the table fits VMEM, and
    the plain layout is what parity transplants expect).
    """

    vocab_sizes: Tuple[int, ...]
    dim: int
    init_std: float = 1e-4
    pad_to: int = 128
    pack_lanes: int = 128
    pack_min_rows: int = 1 << 18
    packed: bool | None = None  # None = auto by size/dim
    # "auto" | "matmul" | "scatter": how the table cotangent is computed on
    # the unpacked path (see take_rows_matmul_grad).  auto = matmul whenever
    # the one-hot fits MATMUL_GRAD_BUDGET_BYTES at the traced batch size.
    grad_mode: str = "auto"
    # Under jax.vmap the traced ids are UNBATCHED, but the backward one-hot
    # materializes once per stacked element — the vmapped seed/lr suites
    # (train/multi_seed.py, train/sweep.py) thread their stack width here so
    # the 'auto' budget reflects the REAL transient bytes S * B * F * vmax * 4
    # (otherwise the >105 MB memory cliff the cap guards against silently
    # reappears at large S; round-2 advisor finding).
    grad_budget_divisor: int = 1
    # table_container="stacked": the param is [2*Vp, 128] — table rows in
    # [0, Vp), the two-phase SparseAdam packed (mu, nu) moment container in
    # [Vp, 2*Vp) (train/sparse_embedding.py SparseAdamFoldedState).  ONE
    # contiguous array lets the pallas table update write a touched row's
    # table+moment pair with a single [2, 1, 128] strided DMA.  Gathers
    # (forward/eval/predict) only ever touch rows < Vp, so every other
    # path is unchanged; the table half's init draws EXACTLY the same
    # normals as the split layout (bitwise-equal transplants/fits).
    dual_container: bool = False
    # dual_shards > 1 (round 5): the stacked container on an
    # explicit-collective mesh uses the SHARD-MAJOR layout — global rows
    # [d*2r, (d+1)*2r), r = Vp/n, hold [table_d; monu_d] — so a contiguous
    # P('model', None) row sharding keeps each physical row's table+moment
    # pair co-resident on its owner shard (train/sparse_embedding.py
    # split_stacked_planes).  Forward gathers map physical row p to global
    # row (p//r)*2r + p%r; 1 = the single-chip plane-major layout
    # (identity map).  The table plane's values are IDENTICAL to the
    # plane-major init's, just block-permuted.
    dual_shards: int = 1

    def setup(self):
        if self.grad_mode not in ("auto", "matmul", "scatter"):
            raise ValueError(
                f"embedding_grad must be 'auto', 'matmul' or 'scatter'; "
                f"got {self.grad_mode!r}"
            )
        offsets = np.concatenate([[0], np.cumsum(self.vocab_sizes)[:-1]]).astype(np.int32)
        self._offsets = jnp.asarray(offsets)
        total = int(sum(self.vocab_sizes))
        self._rows = _round_up(max(total, 1), self.pad_to)
        self.pack_factor = pack_factor_for(
            total,
            self.dim,
            pad_to=self.pad_to,
            pack_lanes=self.pack_lanes,
            pack_min_rows=self.pack_min_rows,
            packed=self.packed,
        )
        if self.pack_factor > 1:
            # physical [rows/P, P*dim]; row-major, so logical row r lives at
            # physical [r // P, (r % P)*dim : (r % P + 1)*dim].
            self._rows = _round_up(self._rows, self.pack_factor * self.pad_to)
            shape = (self._rows // self.pack_factor, self.pack_lanes)
        else:
            shape = (self._rows, self.dim)
        base_init = _padded_normal_init(
            self.init_std, total, self.pack_factor, self.dim
        )
        if self.dual_container:
            # NOTE Mosaic's strided row DMA needs 128-lane f32 physical
            # rows on real TPUs — same constraint as the split pallas
            # update, enforced by the trainer's auto-resolution; narrower
            # test-size tables run the interpret reference path.
            if self.dual_shards > 1 and shape[0] % self.dual_shards != 0:
                raise ValueError(
                    f"stacked container over {self.dual_shards} shards needs "
                    f"the physical row count {shape[0]} to divide evenly"
                )

            def dual_init(key, s, dtype=jnp.float32):
                # write the (bitwise split-identical) table draw into the
                # zeroed fat buffer in place: dynamic_update_slice lets XLA
                # alias the zeros and fuse the normal producer, keeping
                # peak HBM at ~the fat buffer (a concat holds fat + both
                # halves live — OOM at 40M x 32 on 16 GB chips)
                half = (s[0] // 2, s[1])
                base = base_init(key, half, dtype)
                if self.dual_shards > 1:
                    # shard-major: interleave [table_d; monu_d] blocks
                    from ..train.sparse_embedding import fold_stacked_planes

                    return fold_stacked_planes(
                        base, jnp.zeros(half, dtype), self.dual_shards)
                return jax.lax.dynamic_update_slice(
                    jnp.zeros(s, dtype), base, (0, 0))

            self.table = self.param(
                "table", dual_init, (2 * shape[0], shape[1]))
        else:
            self.table = self.param("table", base_init, shape)

    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        """ids: int32 [B, F] (per-feature local ids) -> [B, F, dim]."""
        flat_ids = ids + self._offsets[None, :]
        P = self.pack_factor
        if self.dual_container and self.dual_shards > 1:
            # shard-major stacked layout: map physical rows to their global
            # container rows; matmul-grad is bypassed (its backward assumes
            # the plane-major [V, D] block layout), irrelevant here — the
            # explicit two-phase step never differentiates through this
            # gather (rows are injected) and eval takes no grads.
            from ..train.sparse_embedding import stacked_table_rows

            Vp = self.table.shape[0] // 2
            phys = flat_ids // P if P > 1 else flat_ids
            sup = jnp.take(
                self.table, stacked_table_rows(phys, Vp, self.dual_shards),
                axis=0,
            )
            if P == 1:
                return sup
            sub = jax.nn.one_hot(flat_ids % P, P, dtype=self.table.dtype)
            return jnp.einsum(
                "bfp,bfpd->bfd", sub,
                sup.reshape(*sup.shape[:-1], P, self.dim),
            )
        if P == 1:
            vmax = int(max(self.vocab_sizes))
            onehot_bytes = int(np.prod(ids.shape)) * vmax * 4
            budget = MATMUL_GRAD_BUDGET_BYTES // max(self.grad_budget_divisor, 1)
            if self.grad_mode == "matmul" or (
                self.grad_mode == "auto" and onehot_bytes <= budget
            ):
                return take_rows_matmul_grad(
                    self.table, ids, tuple(self.vocab_sizes), vmax
                )
            return jnp.take(self.table, flat_ids, axis=0)
        sup = jnp.take(self.table, flat_ids // P, axis=0)  # [B, F, 128]
        sub = jax.nn.one_hot(flat_ids % P, P, dtype=self.table.dtype)
        return jnp.einsum(
            "bfp,bfpd->bfd", sub, sup.reshape(*sup.shape[:-1], P, self.dim)
        )


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
    # threaded to FusedEmbedding (embedding_grad).  Validated there even for
    # lane-packed tables, where it has NO effect: the packed super-row
    # gather's cotangent is always the scatter form (the one-hot sub-row
    # select already rides the MXU).
    grad_mode: str = "auto"
    grad_budget_divisor: int = 1  # vmap stack width (see FusedEmbedding)
    dual_container: bool = False  # fold the moment container into the param
    dual_shards: int = 1  # shard-major stacked layout (see FusedEmbedding)

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
                grad_mode=self.grad_mode,
                grad_budget_divisor=self.grad_budget_divisor,
                dual_container=self.dual_container,
                dual_shards=self.dual_shards,
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
        """ids [B, n_sparse] -> [B, n_sparse, D] (uniform-dim fast path).

        If an ``injected`` collection supplies ``sparse_rows`` (the trainer's
        two-phase embedding step pre-gathers the batch rows and differentiates
        w.r.t. THEM, so no dense [V, D] cotangent ever materializes), those
        rows are used verbatim and the table is not touched.
        """
        if self.has_variable("injected", "sparse_rows"):
            return self.get_variable("injected", "sparse_rows")
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
