"""Serving bundles: jax.export round-trip must reproduce Trainer.predict
exactly, with no model-zoo/config code needed at load time."""

import json
import os

import numpy as np
import pytest

from mmlrec_tpu.models import get_model
from mmlrec_tpu.serving import ServingBundle, save_serving_bundle
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer


def _trained(model_name="mmoe", task_name="mtl", n=256, **kw):
    cfg = make_config(
        task_name=task_name, model_name=model_name, emb=4, n_sparse=3,
        n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64, **kw,
    )
    layout, x, y, _ = make_data(cfg, n=n, seed=0)
    model = get_model(model_name, layout, cfg)
    tr = Trainer(model, seed=0).compile(metrics=["auc"])
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0)
    return cfg, tr, x


def test_bundle_roundtrip_matches_trainer(tmp_path):
    cfg, tr, x = _trained()
    meta = save_serving_bundle(tr, str(tmp_path), platforms=["cpu"])
    bundle = ServingBundle.load(str(tmp_path))
    np.testing.assert_allclose(
        bundle.predict(x), tr.predict(x, batch_size=64), atol=1e-6
    )
    assert meta["num_heads"] == 2
    assert os.path.exists(tmp_path / "predict.jaxexport")
    assert os.path.exists(tmp_path / "params.msgpack")


def test_bundle_odd_batch_and_fixed_mode(tmp_path):
    cfg, tr, x = _trained(n=200)  # not a multiple of any batch size used
    save_serving_bundle(tr, str(tmp_path), batch_size=64, platforms=["cpu"])
    bundle = ServingBundle.load(str(tmp_path))
    # force the fixed-batch pad/trim path regardless of export mode
    bundle.meta["batch_mode"] = "fixed"
    bundle.meta["batch_size"] = 64
    np.testing.assert_allclose(
        bundle.predict(x), tr.predict(x, batch_size=64), atol=1e-6
    )


def test_bundle_escm_head_selection(tmp_path):
    cfg, tr, x = _trained(model_name="escm", n=128)
    save_serving_bundle(tr, str(tmp_path), platforms=["cpu"])
    bundle = ServingBundle.load(str(tmp_path))
    preds = bundle.predict(x)
    # escm keeps [pCTR, pCTCVR] (reference basemodel.py:438-441)
    assert preds.shape[1] == 2
    np.testing.assert_allclose(preds, tr.predict(x, batch_size=64), atol=1e-6)


def test_bundle_msl_masked_loss_needs_mask(tmp_path):
    cfg, tr, x = _trained(
        model_name="sharedbottom", task_name="msl", masked_loss=True
    )
    meta = save_serving_bundle(tr, str(tmp_path), platforms=["cpu"])
    assert meta["needs_mask"]
    bundle = ServingBundle.load(str(tmp_path))
    np.testing.assert_allclose(
        bundle.predict(x), tr.predict(x, batch_size=64), atol=1e-6
    )


def test_bundle_loads_without_model_code(tmp_path):
    """The loader path touches only serving.py: meta-driven packing, msgpack
    params, deserialized StableHLO — verified by nulling the registry."""
    cfg, tr, x = _trained()
    save_serving_bundle(tr, str(tmp_path), platforms=["cpu"])
    with open(tmp_path / "meta.json") as f:
        meta = json.load(f)
    assert meta["packing"]["sparse"] == [f"s{i}" for i in range(3)]
    import mmlrec_tpu.models as zoo

    orig = zoo.get_model
    zoo.get_model = None  # any registry use would crash
    try:
        bundle = ServingBundle.load(str(tmp_path))
        preds = bundle.predict(x)
    finally:
        zoo.get_model = orig
    assert preds.shape == (256, 2)
    assert np.isfinite(preds).all()


def test_bundle_requires_params(tmp_path):
    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=4, n_sparse=3, n_dense=2,
        hidden=(16,), tower=(8,), gate=(8,), batch_size=64,
    )
    layout, x, y, _ = make_data(cfg, n=64, seed=0)
    tr = Trainer(get_model("mmoe", layout, cfg), seed=0).compile()
    with pytest.raises(ValueError):
        save_serving_bundle(tr, str(tmp_path))


def test_bundle_two_phase_packed_table(tmp_path):
    """Production-path export: a two-phase-trained model whose fused table
    is LANE-PACKED ([rows/P, 128], >= 2^18 rows triggers packing) must
    export and serve identically — the packed sub-row select is part of the
    exported program."""
    vocab = 1 << 16  # 4 features x 65536 = 2^18 fused rows -> packed
    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=4, n_sparse=4, n_dense=2,
        vocab=vocab, hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
        two_phase_embedding=True,
    )
    layout, x, y, _ = make_data(cfg, n=256, vocab=vocab, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile(metrics=["auc"])
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0)
    table = tr.variables["params"]["embeddings"]["fused"]["table"]
    assert table.shape[1] == 128, table.shape  # really lane-packed

    save_serving_bundle(tr, str(tmp_path), platforms=["cpu"])
    bundle = ServingBundle.load(str(tmp_path))
    np.testing.assert_allclose(
        bundle.predict(x), tr.predict(x, batch_size=64), atol=1e-6
    )


def test_bundle_stacked_container_strips_moments(tmp_path):
    """A stacked-container-trained model (fat [2Vp, 128] param carrying
    the optimizer moment rows) exports a SPLIT-layout bundle — moments are
    stripped, the artifact is half the size, predictions identical."""
    vocab = 1 << 16
    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=4, n_sparse=4, n_dense=2,
        vocab=vocab, hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
        two_phase_embedding=True, table_update="pallas",
        table_opt_dtype="bfloat16", table_container="stacked",
    )
    layout, x, y, _ = make_data(cfg, n=256, vocab=vocab, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile(metrics=["auc"])
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0)
    fat = tr.variables["params"]["embeddings"]["fused"]["table"]

    save_serving_bundle(tr, str(tmp_path), platforms=["cpu"])
    bundle = ServingBundle.load(str(tmp_path))
    served = bundle.variables["params"]["embeddings"]["fused"]["table"]
    assert served.shape[0] * 2 == fat.shape[0]
    np.testing.assert_array_equal(
        np.asarray(served), np.asarray(fat[: fat.shape[0] // 2]))
    np.testing.assert_allclose(
        bundle.predict(x), tr.predict(x, batch_size=64), atol=1e-6
    )


def test_bundle_mesh_stacked_shard_major_strips_moments(tmp_path):
    """Round 5: a MESH-stacked trainer (shard-major fat layout) exports
    the same split-layout bundle — the table plane is extracted through
    split_stacked_planes(n_shards), predictions match."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from mmlrec_tpu.parallel import create_mesh
    from mmlrec_tpu.train.sparse_embedding import split_stacked_planes
    import jax.numpy as jnp

    cfg = make_config(
        task_name="mtl", model_name="sharedbottom", n_sparse=4, n_dense=2,
        vocab=80, hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
        lr=3e-3, two_phase_embedding=True,
        explicit_collective_embedding=True, table_update="pallas",
        table_opt_dtype="bfloat16", table_container="stacked",
        dedup_route="gather", stacked_shards=2,
    )
    layout, x, y, _ = make_data(cfg, n=256, vocab=80, seed=0)
    model = get_model("sharedbottom", layout, cfg)
    tr = Trainer(model, seed=0, mesh=create_mesh(data=4, model=2)).compile(
        metrics=["auc"])
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    fat = jnp.asarray(jax.device_get(
        tr.variables["params"]["embeddings"]["fused"]["table"]))

    save_serving_bundle(tr, str(tmp_path), platforms=["cpu"])
    bundle = ServingBundle.load(str(tmp_path))
    served = bundle.variables["params"]["embeddings"]["fused"]["table"]
    assert served.shape[0] * 2 == fat.shape[0]
    np.testing.assert_array_equal(
        np.asarray(served), np.asarray(split_stacked_planes(fat, 2)[0]))
    np.testing.assert_allclose(
        bundle.predict(x), tr.predict(x, batch_size=64), atol=1e-6
    )
