"""Worker for tests/test_multihost.py: one process of a 2-process CPU
``jax.distributed`` run.

Each process builds the same global (data, model) mesh over ALL processes'
devices, feeds its LOCAL shard of one global batch through
``parallel/multihost.py::host_local_batch_to_global``, runs ONE jitted
sharded train step, and dumps the loss + updated embedding table for the
parent test to compare against a single-process run.

Usage: python _multihost_worker.py <port> <process_id> <num_processes> <out.npz>
       [mode]

mode "dense" (default): one device/process, (data=nproc, model=1) mesh, one
jitted GSPMD train step.  mode "production" (round 5, VERDICT r4 #5): FOUR
devices/process, (data=4, model=2) global mesh, and a full Trainer.fit
through the PRODUCTION path — explicit collectives + pallas two-phase +
stacked shard-major container + gather-route dedup — so per-process host
metadata and shard-local row windows cross real process boundaries.
"""

import os
import sys


def _gather_sharded(arr):
    """Reassemble a (possibly cross-process) sharded array from this
    process's addressable shards; asserts full local coverage."""
    import numpy as np

    out = np.full(arr.shape, np.nan, dtype=arr.dtype)
    for sh in arr.addressable_shards:
        out[sh.index] = np.asarray(sh.data)
    assert not np.isnan(out).any(), "table not fully addressable locally"
    return out


def _production(mesh, out_path):
    import jax
    import numpy as np

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config, make_data
    from mmlrec_tpu.train import Trainer

    cfg = make_config(
        task_name="mtl", model_name="sharedbottom", n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64, lr=3e-3,
        vocab=80, two_phase_embedding=True,
        explicit_collective_embedding=True, table_update="pallas",
        table_opt_dtype="bfloat16", table_container="stacked",
        dedup_route="gather", stacked_shards=2,
    )
    layout, x, y, _ = make_data(cfg, n=256, seed=0, vocab=80)
    tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0,
                 mesh=mesh).compile()
    # every process holds the full dataset (same synthetic seed) and runs
    # the IDENTICAL SPMD fit program; host metadata is computed per
    # process and must agree — that is exactly what this pins
    tr.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    fat = tr._train_state["params"]["embeddings"]["fused"]["table"]
    np.savez(
        out_path,
        loss=np.asarray([h["loss"] for h in tr.history]),
        table=_gather_sharded(fat),
    )
    print("STEP_OK", flush=True)


def main():
    port, pid, nproc, out_path = sys.argv[1:5]
    mode = sys.argv[5] if len(sys.argv) > 5 else "dense"
    pid, nproc = int(pid), int(nproc)
    os.environ["JAX_PLATFORMS"] = "cpu"
    # dense: one CPU device per process -> (data=2, model=1) global mesh;
    # production: four per process -> (data=4, model=2)
    per_proc = 4 if mode == "production" else 1
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={per_proc}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mmlrec_tpu.parallel.multihost import (
        host_local_batch_to_global,
        initialize_distributed,
        local_batch_size,
    )

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    # distributed init (the part that can legitimately be unsupported on a
    # CI box) succeeded — any failure past this marker is a real bug
    print("INIT_OK", flush=True)
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * jax.local_device_count()

    import numpy as np
    from jax.sharding import Mesh

    if mode == "production":
        mesh = Mesh(
            np.asarray(jax.devices()).reshape(4, 2), ("data", "model")
        )
        _production(mesh, out_path)
        return

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config, make_data
    from mmlrec_tpu.train import Trainer

    mesh = Mesh(
        np.asarray(jax.devices()).reshape(jax.device_count(), 1),
        ("data", "model"),
    )
    cfg = make_config(
        task_name="mtl", model_name="mmoe", n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64, lr=3e-3,
    )
    layout, x, y, _ = make_data(cfg, n=128, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0, mesh=mesh).compile()
    ids, dense = tr.pack_inputs(x)
    y2 = tr._prepare_y(y)

    B = 64
    lb = local_batch_size(B) * jax.local_device_count()
    lo = pid * lb
    batch_local = (
        ids[lo : lo + lb],
        dense[lo : lo + lb],
        y2[lo : lo + lb],
        None,
        np.ones(lb, np.float32),
    )
    batch = host_local_batch_to_global(batch_local, mesh)
    assert batch[0].shape[0] == B  # global batch reassembled

    tr.variables = tr._init_variables(ids[:2], dense[:2])
    params = tr.variables["params"]
    state = {
        "params": params,
        "batch_stats": tr.variables.get("batch_stats", {}),
        "opt_state": jax.jit(tr.tx.init)(params),
        "rng": jax.random.PRNGKey(tr.seed + 1),
    }
    step = tr._make_train_step()
    new_state, total_loss, data_loss, probs = step(state, batch)
    # the fused table is P('model', None) on a model-axis of size 1 ->
    # fully replicated, so every process can read it whole
    table = new_state["params"]["embeddings"]["fused"]["table"]
    np.savez(
        out_path,
        loss=np.asarray(jax.device_get(total_loss)),
        table=np.asarray(jax.device_get(table)),
    )
    print("STEP_OK", flush=True)


if __name__ == "__main__":
    main()
