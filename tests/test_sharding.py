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
