"""Multi-host SPMD helpers.

The reference's multi-node path is two broken lines of NCCL init
(reference main.py:81-83, SURVEY §2.4.4).  Here multi-host is the same SPMD
program as single-host: every process calls ``initialize_distributed()``,
builds the same global Mesh over ``jax.devices()`` (all hosts' devices), and
feeds its *local* shard of each global batch through
``host_local_batch_to_global``; XLA runs the gradient psums over ICI/DCN.

Exercised with REAL process boundaries by tests/test_multihost.py: two CPU
processes join via jax.distributed (Gloo collectives), assemble one global
batch from per-process shards through ``host_local_batch_to_global``, run a
sharded train step, and are pinned equal to the single-process run.  The
driver's multi-chip dryrun additionally validates the N-device mesh
shardings compile and execute.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize wrapper; no-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_local_batch_to_global(batch, mesh: Mesh):
    """Assemble per-host numpy shards into global jax.Arrays sharded over the
    'data' mesh axis (jax.make_array_from_process_local_data)."""

    def put(x):
        if x is None:
            return None
        sharding = NamedSharding(mesh, P("data", *([None] * (np.ndim(x) - 1))))
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, batch, is_leaf=lambda v: v is None)


def local_batch_size(global_batch_size: int) -> int:
    return global_batch_size // jax.process_count()
