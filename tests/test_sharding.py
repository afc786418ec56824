"""Multi-device SPMD tests on an 8-way virtual CPU mesh (conftest.py sets
--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlrec_tpu.models import get_model
from mmlrec_tpu.parallel import create_mesh, shard_batch, shard_variables
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_mesh_shapes():
    mesh = create_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh(data=3, model=2)


def _setup(mesh=None):
    cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4, n_dense=2,
                      hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
                      lr=3e-3)
    layout, x, y, _ = make_data(cfg, n=512, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0, mesh=mesh).compile()
    return tr, x, y


def test_sharded_variables_placement():
    mesh = create_mesh(data=4, model=2)
    tr, x, y = _setup(mesh)
    ids, dense = tr.pack_inputs(x)
    variables = tr._init_variables(ids[:2], dense[:2])
    table = variables["params"]["embeddings"]["fused"]["table"]
    # vocab axis sharded over 'model'
    assert "model" in str(table.sharding.spec)
    kernel = variables["params"]["expert_dnn"]["dense_0"]["kernel"]
    assert kernel.sharding.is_fully_replicated


def test_sharded_training_matches_single_device():
    tr_single, x, y = _setup(None)
    tr_single.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)

    mesh = create_mesh(data=4, model=2)
    tr_mesh, x2, y2 = _setup(mesh)
    tr_mesh.fit(x2, y2, batch_size=64, epochs=1, verbose=0, shuffle=False)

    p1 = tr_single.predict(x, batch_size=64)
    p2 = tr_mesh.predict(x2, batch_size=64)
    np.testing.assert_allclose(p1, p2, rtol=2e-3, atol=2e-4)


def test_data_parallel_only_mesh():
    mesh = create_mesh(data=8, model=1)
    tr, x, y = _setup(mesh)
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0)
    assert np.isfinite(tr.history[0]["loss"])


def test_shard_batch_handles_none():
    mesh = create_mesh(data=8, model=1)
    batch = (jnp.ones((64, 4)), None, jnp.ones((64,)))
    out = shard_batch(batch, mesh)
    assert out[1] is None
    assert "data" in str(out[0].sharding.spec)


def test_two_phase_sharded_matches_single_device():
    """two_phase_embedding under a (data, model) mesh: GSPMD partitions the
    row gather / scatter-add path; numerics match the unsharded run."""
    def setup(mesh):
        cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4,
                          n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                          batch_size=64, lr=3e-3, two_phase_embedding=True)
        layout, x, y, _ = make_data(cfg, n=512, seed=0)
        model = get_model("mmoe", layout, cfg)
        return Trainer(model, seed=0, mesh=mesh).compile(), x, y

    tr_single, x, y = setup(None)
    tr_single.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    tr_mesh, x2, y2 = setup(create_mesh(data=4, model=2))
    tr_mesh.fit(x2, y2, batch_size=64, epochs=1, verbose=0, shuffle=False)
    p1 = tr_single.predict(x, batch_size=64)
    p2 = tr_mesh.predict(x2, batch_size=64)
    np.testing.assert_allclose(p1, p2, rtol=2e-3, atol=2e-4)


def test_mesh_device_staged_fit_matches_streaming():
    """The mesh fast path (device-staged SHARDED dataset + distributed_take
    + scan runner) is bitwise the streaming per-batch-upload mesh path: the
    global batch content is identical and GSPMD partitions the same step."""
    tr_stream, x, y = _setup(create_mesh(data=4, model=2))
    tr_stream._device_data_bytes_cap = 0  # force the streaming path
    tr_stream.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    tr_staged, x2, y2 = _setup(create_mesh(data=4, model=2))
    tr_staged.fit(x2, y2, batch_size=64, epochs=1, verbose=0, shuffle=False)
    # the staged path really ran (scan runners / gather step were built)
    assert any(
        k.startswith("scan_") or k == "gather_step"
        for k in tr_staged._step_fns
    ), list(tr_staged._step_fns)
    p1 = tr_stream.predict(x, batch_size=64)
    p2 = tr_staged.predict(x2, batch_size=64)
    np.testing.assert_array_equal(p1, p2)
    # dataset is actually sharded over 'data' per device
    staged = tr_staged._stage_dataset(*[
        np.zeros((64, d), np.float32) for d in (4, 2, 2)
    ], None)
    assert "data" in str(staged.sharding.spec)


def test_mesh_device_staged_two_phase_matches_single_device():
    """two_phase GSPMD through the staged mesh path == unsharded run."""
    def setup(mesh):
        cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4,
                          n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                          batch_size=64, lr=3e-3, two_phase_embedding=True)
        layout, x, y, _ = make_data(cfg, n=512, seed=0)
        model = get_model("mmoe", layout, cfg)
        return Trainer(model, seed=0, mesh=mesh).compile(), x, y

    tr_single, x, y = setup(None)
    tr_single.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    tr_mesh, x2, y2 = setup(create_mesh(data=4, model=2))
    tr_mesh.fit(x2, y2, batch_size=64, epochs=1, verbose=0, shuffle=False)
    np.testing.assert_allclose(
        tr_single.predict(x, batch_size=64),
        tr_mesh.predict(x2, batch_size=64),
        rtol=2e-3, atol=2e-4,
    )


def test_mesh_indivisible_batch_falls_back_to_streaming():
    """batch_size not divisible by the data axis -> streaming semantics
    (shard_batch replicates), not a staged-path crash."""
    mesh = create_mesh(data=8, model=1)
    tr, x, y = _setup(mesh)
    tr.fit(x, y, batch_size=60, epochs=1, verbose=0, shuffle=False)
    assert "gather_step" not in tr._step_fns
    assert not any(k.startswith("scan_") for k in tr._step_fns)
    assert np.isfinite(tr.history[0]["loss"])


def _setup_eval(mesh, device_eval):
    cfg = make_config(task_name="msl", model_name="mmoe", n_sparse=4,
                      n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                      batch_size=64, lr=3e-3)
    if device_eval:
        cfg.training_config.extra["device_eval"] = True
    layout, x, y, mask = make_data(cfg, n=512, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0, mesh=mesh).compile(metrics=["auc"])
    return tr, x, y, mask


def test_mesh_device_eval_matches_host_eval():
    """device_eval under a mesh: fused on-device metrics (scalars only
    leave the devices) equal the host sklearn path's values."""
    tr_h, x, y, _ = _setup_eval(create_mesh(data=4, model=2), False)
    tr_h.fit(x, y, batch_size=64, epochs=2, validation_data=(x, y),
             verbose=0, shuffle=False)
    tr_d, x2, y2, _ = _setup_eval(create_mesh(data=4, model=2), True)
    tr_d.fit(x2, y2, batch_size=64, epochs=2, validation_data=(x2, y2),
             verbose=0, shuffle=False)
    assert tr_d._use_device_eval()
    for h_host, h_dev in zip(tr_h.history, tr_d.history):
        assert abs(h_host["val_auc"] - h_dev["val_auc"]) < 1e-6


def test_mesh_masked_test_metrics_device_matches_host():
    """Final masked per-head metrics fully on device under a mesh equal the
    host masked_test_metrics path (reference main.py:134-172 semantics)."""
    from mmlrec_tpu.train.metrics import masked_test_metrics

    tr, x, y, mask = _setup_eval(create_mesh(data=4, model=2), True)
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    row_dev = tr.masked_test_metrics_device(x, y, mask, batch_size=64)
    pred = tr.predict(x, batch_size=64)
    row_host = masked_test_metrics(
        tr._prepare_y(y), pred, "msl", 2, mask, tr.model.task_types
    )
    assert set(row_dev) == set(row_host)
    for k in row_dev:
        assert abs(row_dev[k] - round(row_host[k], 4)) <= 1e-4, (k, row_dev[k], row_host[k])
