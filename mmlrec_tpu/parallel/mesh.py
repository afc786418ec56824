"""Device mesh + sharding rules.

The reference's only working parallelism is single-process
``torch.nn.DataParallel`` (model/basemodel.py:235-238) plus a broken NCCL
init (main.py:81-83).  The TPU-native replacement is SPMD over a
``(data, model)`` mesh:

* batches are sharded over the ``data`` axis (pure data parallelism —
  XLA inserts the gradient psum over ICI);
* the fused embedding table — the only parameter that grows with the
  dataset — is row(vocab)-sharded over the ``model`` axis; XLA turns the
  lookup gather into the appropriate all-gather / all-to-all collective and
  the backward scatter-add into a reduce-scatter;
* every other parameter is replicated (expert/tower MLPs are tiny).

No per-rank plumbing: arrays carry NamedShardings and ``jax.jit`` does the
rest.  Multi-host runs only additionally need
``jax.distributed.initialize()``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def _is_embedding_table(path) -> bool:
    keys = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
    return any(k == "table" or k.startswith("table_") for k in keys)


def variable_shardings(variables, mesh: Mesh):
    """NamedSharding pytree: embedding tables P('model', None), rest replicated."""

    def spec_for(path, leaf):
        if _is_embedding_table(path) and getattr(leaf, "ndim", 0) >= 1:
            rows = leaf.shape[0]
            if rows % mesh.shape["model"] == 0:
                return NamedSharding(mesh, P("model", *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, variables)


def shard_variables(variables, mesh: Mesh):
    shardings = variable_shardings(variables, mesh)
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, s), variables, shardings
    )


def distributed_take(staged, idx, mesh: Mesh):
    """Global-batch row fetch from a row-sharded device-staged dataset.

    ``staged``: [N, D] f32, rows sharded ``P('data', None)`` (N divisible by
    the data axis).  ``idx``: [B] int32 global row indices, replicated, with
    B divisible by the data axis.  Returns the batch [B, D] sharded
    ``P('data', None)``.

    This is the textbook distributed gather, hand-placed so the collective
    is a single reduce-scatter over ICI instead of whatever GSPMD picks for
    a gather on a sharded operand (typically an all-gather of the operand —
    N*D bytes on the wire — or a [B, D] psum, n_data x the reduce-scatter's
    bytes): each data shard gathers the batch rows it OWNS (masked local
    take) and ``psum_scatter`` both sums the one-hot contributions and
    routes batch slice t to shard t in one pass.  Bytes on the wire per
    device: B*D*4 * (n-1)/n.  Equal to ``jnp.take(staged, idx)`` exactly
    (each batch row is owned by exactly one shard; f32 values pass through
    one masked select and one sum with zeros).

    The reference has no counterpart: its DataLoader re-uploads every batch
    from host pinned memory (model/basemodel.py:261-264).
    """
    n_data = mesh.shape["data"]

    def fetch(local, idx_):
        rows_local = local.shape[0]
        lo = jax.lax.axis_index("data") * rows_local
        rel = idx_ - lo
        owned = (rel >= 0) & (rel < rows_local)
        rows = jnp.take(local, jnp.clip(rel, 0, rows_local - 1), axis=0)
        contrib = jnp.where(owned[:, None], rows, jnp.zeros((), rows.dtype))
        return jax.lax.psum_scatter(
            contrib, "data", scatter_dimension=0, tiled=True
        )

    del n_data  # (documented constraint; shard_map enforces divisibility)
    return jax.shard_map(
        fetch,
        mesh=mesh,
        in_specs=(P("data", None), P()),
        out_specs=P("data", None),
        check_vma=False,
    )(staged, idx)


def shard_batch(batch, mesh: Mesh):
    """Shard leading (batch) axis over the 'data' mesh axis."""
    data_size = mesh.shape["data"]

    def put(x):
        if x is None:
            return None
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % data_size == 0:
            return jax.device_put(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch, is_leaf=lambda v: v is None)
