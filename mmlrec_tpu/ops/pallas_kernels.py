"""Pallas TPU kernels for the recsys hot path.

Three fusions the BASELINE north star calls out: embedding lookup, gated
expert mixing, multi-head scoring.  Each has an XLA fallback (the jnp
expression of identical math); ``interpret=True`` paths keep the kernels
testable on CPU.

The input pipeline's dominant op is the sparse-side fetch: gather [B, F]
rows from the fused table and lay them down flattened next to the dense
features as the DNN input matrix.  ``fused_embed_concat`` does the gather
AND the flatten+concat in one VMEM pass per batch tile, writing the final
[B, F*D + n_dense] block directly instead of materializing [B, F, D] in HBM
and re-reading it for the reshape/concat.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ----------------------------------------------------------------------
# fused embedding gather + flatten + dense concat
# ----------------------------------------------------------------------
def _embed_concat_kernel(ids_ref, table_ref, dense_ref, out_ref):
    ids = ids_ref[:]  # [TB, F] int32
    table = table_ref[:]  # [V, D]
    tb, f = ids.shape
    # Mosaic requires 1-D gather indices; flatten then reshape.
    emb = jnp.take(table, ids.reshape(tb * f), axis=0)  # [TB*F, D]
    flat = emb.reshape(tb, f * table.shape[1])
    out_ref[:, : flat.shape[1]] = flat
    out_ref[:, flat.shape[1] :] = dense_ref[:]


def fused_embed_concat(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    dense: jnp.ndarray,
    *,
    block_b: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """[V, D] table, [B, F] pre-offset ids, [B, Nd] dense -> [B, F*D + Nd].

    Equivalent XLA math: concat(take(table, ids).reshape(B, F*D), dense).
    """
    B, F = ids.shape
    V, D = table.shape
    Nd = dense.shape[1]
    out_w = F * D + Nd
    block_b = min(block_b, B)
    grid = (_cdiv(B, block_b),)
    return pl.pallas_call(
        _embed_concat_kernel,
        out_shape=jax.ShapeDtypeStruct((B, out_w), table.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Nd), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, out_w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(ids, table, dense)


def _embed_concat_fwd(table, ids, dense, *, block_b, interpret):
    out = fused_embed_concat(table, ids, dense, block_b=block_b, interpret=interpret)
    return out, (table.shape, ids, dense.shape[1])


def _embed_concat_bwd(block_b, interpret, res, g):
    (V, D), ids, Nd = res
    B, F = ids.shape
    g_emb = g[:, : F * D].reshape(B * F, D)
    d_table = jnp.zeros((V, D), g.dtype).at[ids.reshape(-1)].add(g_emb)
    d_dense = g[:, F * D :]
    return d_table, None, d_dense


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _embed_concat_diff(table, ids, dense, block_b, interpret):
    return fused_embed_concat(table, ids, dense, block_b=block_b, interpret=interpret)


def _embed_concat_diff_fwd(table, ids, dense, block_b, interpret):
    return _embed_concat_fwd(table, ids, dense, block_b=block_b, interpret=interpret)


_embed_concat_diff.defvjp(_embed_concat_diff_fwd, _embed_concat_bwd)


def embed_concat(table, ids, dense, *, block_b: int = 512, interpret: bool = False):
    """Differentiable fused gather+concat (backward = scatter-add to the
    table, the standard embedding VJP)."""
    return _embed_concat_diff(table, ids, dense, block_b, interpret)


# ----------------------------------------------------------------------
# gated expert mixing: softmax over gate logits fused with the expert mix
# ----------------------------------------------------------------------
def _gated_mix_kernel(logits_ref, experts_ref, out_ref):
    g = jax.nn.softmax(logits_ref[:], axis=-1)  # [TB, T, E]
    x = experts_ref[:]  # [TB, E, D]
    out_ref[:] = jax.lax.dot_general(
        g,
        x,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def gated_expert_mix(
    gate_logits: jnp.ndarray,
    experts: jnp.ndarray,
    *,
    block_b: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(gate_logits) @ experts in one VMEM pass.

    gate_logits [B, T, E], experts [B, E, D] -> [B, T, D]
    (reference per-task loop + matmul, model/mmoe.py:78-88).
    """
    B, T, E = gate_logits.shape
    _, _, D = experts.shape
    block_b = min(block_b, B)
    grid = (_cdiv(B, block_b),)
    return pl.pallas_call(
        _gated_mix_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, D), experts.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, T, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, E, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(gate_logits, experts)


# ----------------------------------------------------------------------
# multi-head scoring: per-head final linear + bias + sigmoid in one pass
# ----------------------------------------------------------------------
def _score_kernel(tower_ref, w_ref, b_ref, out_ref):
    x = tower_ref[:]  # [TB, T, H]
    w = w_ref[:]  # [T, H]
    logits = jnp.sum(x * w[None], axis=-1)  # [TB, T]
    out_ref[:] = jax.nn.sigmoid(logits + b_ref[:][None])


def multihead_score(
    tower: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    block_b: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """tower [B, T, H], weights [T, H], bias [T] -> sigmoid probs [B, T]
    (reference tower_dnn_final_layer + PredictionLayer epilogue,
    model/mmoe.py:91-100)."""
    B, T, H = tower.shape
    block_b = min(block_b, B)
    grid = (_cdiv(B, block_b),)
    return pl.pallas_call(
        _score_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T), tower.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, T, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tower, weights, bias)
