"""Compiled-bytes comparison of the explicit-collective mesh step variants.

Multi-chip hardware is unavailable in this image, so byte-optimality of
the compiled program is the proxy for the >=80% scaling target (VERDICT
r3 #2: "compiled-bytes comparison recorded").  This compiles the EXACT
explicit-collective train step on the 8-device virtual CPU mesh
(data=2 x model=4) for each update variant and records XLA's compiled
cost analysis (bytes accessed, flops) per step.

Run: python benchmarks/mesh_step_bytes.py
(no TPU needed; forces CPU with 8 virtual devices).
"""
from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def run(route: str, vocab: int = 200_000, n_sparse: int = 16,
        emb_dim: int = 32, batch: int = 4096):
    # route "stacked" / "stacked_slot" (round 5): the shard-major folded
    # container on the mesh (sharded_two_phase_sparse_adam_folded) with the
    # gather route, position- or slot-space — the compiled-bytes record for
    # the mesh port of the full single-chip kernel recipe
    container = "stacked" if route.startswith("stacked") else "split"
    update_space = "slot" if route == "stacked_slot" else "auto"
    dedup = "gather" if container == "stacked" else route
    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.parallel.mesh import create_mesh
    from mmlrec_tpu.synthetic import make_config
    from mmlrec_tpu.train import Trainer

    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=emb_dim, n_sparse=n_sparse,
        n_dense=4, hidden=(256, 128), tower=(64,), gate=(64,),
        batch_size=batch, two_phase_embedding=True,
        explicit_collective_embedding=True, table_update="pallas",
        table_opt_dtype="bfloat16", dedup_route=dedup, dnn_dropout=0.0,
        **({"table_container": "stacked", "stacked_shards": 4,
            "update_space": update_space} if container == "stacked" else {}),
    )
    cols = [SparseFeat(f"s{i}", vocab, emb_dim) for i in range(n_sparse)] + [
        DenseFeat(f"d{i}", 1) for i in range(4)]
    layout = FeatureLayout(cols)
    model = get_model("mmoe", layout, cfg)
    trainer = Trainer(model, seed=0,
                      mesh=create_mesh(data=2, model=4)).compile(metrics=[])

    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, vocab, (batch, n_sparse)).astype(np.int32)
    dense = jnp.asarray(rng.random((batch, 4)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (batch, 2)), jnp.float32)
    trainer.variables = trainer._init_variables(ids_np[:2], np.asarray(dense[:2]))
    params = trainer.variables["params"]
    from mmlrec_tpu.train.sparse_embedding import (
        SparseAdamFoldedState, init_sparse_adam)

    state = {
        "params": params,
        "batch_stats": trainer.variables.get("batch_stats", {}),
        "opt_state": trainer.tx.init(trainer._without_table(params)[0]),
        "rng": jax.random.PRNGKey(1),
        "table_opt": (
            SparseAdamFoldedState(count=jnp.zeros((), jnp.int32))
            if container == "stacked"
            else init_sparse_adam(
                params["embeddings"]["fused"]["table"], dtype="bfloat16",
                packed=True)),
    }
    offs = np.asarray(trainer._fused_offsets)[None, :]
    flat = (ids_np.astype(np.int64) + offs).reshape(1, -1)
    meta = trainer._step_metadata(flat)
    batch_t = (jnp.asarray(ids_np), dense, y, None,
               jnp.ones((batch,), jnp.float32),
               ) + tuple(jnp.asarray(a[0]) for a in meta)

    def one_step(s):
        s2, total, dl, probs = trainer._step_body(s, batch_t)
        return s2, total

    lowered = jax.jit(one_step, donate_argnums=(0,)).lower(state)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    out = {
        "metric": "explicit_mesh_step_compiled_bytes",
        "dedup_route": route,
        "vocab_rows": vocab * n_sparse,
        "bytes_accessed_mb": round(ca.get("bytes accessed", 0.0) / 1e6, 1),
        "gflops": round(ca.get("flops", 0.0) / 1e9, 2),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    routes = sys.argv[1:] or ["scatter", "gather", "stacked", "stacked_slot"]
    rows = [run(r) for r in routes]
    if len(rows) == 2:
        a, b = rows
        print(f"gather/scatter bytes ratio: "
              f"{b['bytes_accessed_mb'] / a['bytes_accessed_mb']:.3f}")
