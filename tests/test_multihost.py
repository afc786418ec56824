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
