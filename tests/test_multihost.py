"""Real multi-PROCESS coverage for parallel/multihost.py: two CPU processes
join via ``jax.distributed.initialize`` (Gloo collectives), assemble one
global batch from per-process shards with ``host_local_batch_to_global``,
run one sharded train step each, and must agree with a single-process run.

The reference's multi-node path is two broken NCCL lines (reference
main.py:81-83, SURVEY §2.4.4); this pins the rebuilt path's semantics with
actual process boundaries rather than a virtual single-process mesh.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the worker pins its own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_two_process_step_matches_single_process(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"proc{i}.npz" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(i), "2", str(outs[i])],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=_clean_env(),
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for i, (p, log) in enumerate(zip(procs, logs)):
        if p.returncode != 0:
            if "INIT_OK" not in log:
                pytest.skip(
                    f"jax.distributed CPU init unavailable here:\n{log[-800:]}"
                )
            raise AssertionError(f"worker {i} failed after init:\n{log[-2000:]}")
        assert "STEP_OK" in log, log[-2000:]

    results = [np.load(o) for o in outs]
    # both processes computed the same replicated outcome
    np.testing.assert_array_equal(results[0]["loss"], results[1]["loss"])
    np.testing.assert_array_equal(results[0]["table"], results[1]["table"])

    # single-process reference: identical model/seed/batch, no mesh
    import jax

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config, make_data
    from mmlrec_tpu.train import Trainer

    cfg = make_config(
        task_name="mtl", model_name="mmoe", n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64, lr=3e-3,
    )
    layout, x, y, _ = make_data(cfg, n=128, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    ids, dense = tr.pack_inputs(x)
    y2 = tr._prepare_y(y)
    import jax.numpy as jnp

    batch = (
        jnp.asarray(ids[:64]),
        jnp.asarray(dense[:64]),
        jnp.asarray(y2[:64]),
        None,
        jnp.ones(64, jnp.float32),
    )
    tr.variables = tr._init_variables(ids[:2], dense[:2])
    params = tr.variables["params"]
    state = {
        "params": params,
        "batch_stats": tr.variables.get("batch_stats", {}),
        "opt_state": tr.tx.init(params),
        "rng": jax.random.PRNGKey(1),
    }
    new_state, total_loss, _, _ = tr._make_train_step()(state, batch)
    np.testing.assert_allclose(
        float(results[0]["loss"]), float(total_loss), rtol=1e-5
    )
    np.testing.assert_allclose(
        results[0]["table"],
        np.asarray(new_state["params"]["embeddings"]["fused"]["table"]),
        rtol=1e-5, atol=1e-7,
    )


def test_two_process_production_fit_matches_virtual_mesh(tmp_path):
    """Round 5 (VERDICT r4 #5): the PRODUCTION path — explicit collectives
    + pallas two-phase + stacked shard-major container + gather-route
    dedup — fits across 2 REAL processes (4 devices each, (data=4,
    model=2) global mesh).  Per-process host metadata and shard-local row
    windows cross actual process boundaries; both processes must agree
    bitwise with each other and match the single-process virtual-mesh fit."""
    port = _free_port()
    outs = [tmp_path / f"prod{i}.npz" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(i), "2", str(outs[i]),
             "production"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=_clean_env(),
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for i, (p, log) in enumerate(zip(procs, logs)):
        if p.returncode != 0:
            if "INIT_OK" not in log:
                pytest.skip(
                    f"jax.distributed CPU init unavailable here:\n{log[-800:]}"
                )
            raise AssertionError(f"worker {i} failed after init:\n{log[-2000:]}")
        assert "STEP_OK" in log, log[-2000:]

    results = [np.load(o) for o in outs]
    # both processes reconstructed the identical sharded table + losses
    np.testing.assert_array_equal(results[0]["loss"], results[1]["loss"])
    np.testing.assert_array_equal(results[0]["table"], results[1]["table"])

    # single-process reference on the virtual 8-device mesh (same config)
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.parallel import create_mesh
    from mmlrec_tpu.synthetic import make_config, make_data
    from mmlrec_tpu.train import Trainer
    from mmlrec_tpu.train.sparse_embedding import split_stacked_planes

    import jax
    import jax.numpy as jnp

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
                 mesh=create_mesh(data=4, model=2)).compile()
    tr.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    fat_ref = np.asarray(jax.device_get(
        tr._train_state["params"]["embeddings"]["fused"]["table"]))
    # table planes match the 2-process run (Gloo vs single-process psum
    # reduction order and per-program FMA/fusion choices differ at the
    # last ulp; a pre-round ulp can flip a bf16-moment rounding, so the
    # band is the bf16-path tolerance used elsewhere in this suite)
    t_ref = np.asarray(split_stacked_planes(jnp.asarray(fat_ref), 2)[0])
    t_got = np.asarray(split_stacked_planes(
        jnp.asarray(results[0]["table"]), 2)[0])
    np.testing.assert_allclose(t_got, t_ref, rtol=2e-3, atol=1e-5)
    loss_ref = np.asarray([h["loss"] for h in tr.history])
    np.testing.assert_allclose(results[0]["loss"], loss_ref, rtol=1e-5)
