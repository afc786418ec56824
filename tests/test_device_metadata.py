"""On-device per-batch dedup metadata (round 5,
train/sparse_embedding.py::device_step_metadata): value parity with the
host batch_step_metadata and bitwise fit equality against the
host-metadata path."""

import jax.numpy as jnp
import numpy as np
import pytest

from mmlrec_tpu.models import get_model
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer
from mmlrec_tpu.train.sparse_embedding import (
    batch_step_metadata,
    device_step_metadata,
)


@pytest.mark.parametrize("pack_factor,dups", [(1, True), (4, True), (4, False)])
def test_device_step_metadata_matches_host(pack_factor, dups):
    rng = np.random.RandomState(0)
    K, V = 96, 400  # logical ids; phys rows V // P
    n_phys = V // pack_factor
    hi = 40 if dups else V  # heavy duplication vs near-unique
    flat = rng.randint(0, hi, (1, K)).astype(np.int64)
    inv, rep, pids, pinv, nuniq, prep = batch_step_metadata(
        flat, pack_factor, n_phys, chunk=16)
    d = device_step_metadata(
        jnp.asarray(flat[0], jnp.int32), pack_factor, pids.shape[1], n_phys)
    d_inv, d_rep, d_pids, d_pinv, d_nuniq, d_prep = [np.asarray(a) for a in d]
    np.testing.assert_array_equal(d_inv, inv[0])
    np.testing.assert_array_equal(d_rep, rep[0])
    np.testing.assert_array_equal(d_pinv, pinv[0])
    np.testing.assert_array_equal(d_prep, prep[0])
    assert int(d_nuniq[0]) == int(nuniq[0, 0])
    n = int(nuniq[0, 0])
    # real prefix identical; device pads are n_phys (bounds-skipped), host
    # pads are distinct untouched rows (legacy XLA-unique-scatter contract)
    np.testing.assert_array_equal(d_pids[:n], pids[0, :n])
    assert (d_pids[n:] == n_phys).all()


def _fit_pair(extra, fit_kw, vocab=80, n=320):
    outs = {}
    for name, dev in (("device", True), ("host", False)):
        cfg = make_config(
            task_name="mtl", model_name="sharedbottom", n_sparse=4,
            n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
            batch_size=64, lr=3e-3, vocab=vocab, two_phase_embedding=True,
            device_metadata=dev, **extra,
        )
        layout, x, y, _ = make_data(cfg, n=n, seed=0, vocab=vocab)
        tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
        tr.fit(x, y, verbose=0, **fit_kw)
        outs[name] = np.asarray(
            tr.variables["params"]["embeddings"]["fused"]["table"])
    np.testing.assert_array_equal(outs["device"], outs["host"])


def test_fit_device_metadata_bitwise_scatter_update():
    """Plain two-phase scatter update: (inv, rep) computed in-step give a
    bitwise-identical fit to the host metadata path (full shuffle)."""
    _fit_pair({}, dict(batch_size=64, epochs=2, shuffle=True))


def test_fit_device_metadata_bitwise_pallas_stacked():
    """Stacked container + pallas dual write, scatter dedup route: the
    in-step metadata (pid pads = n_phys, bounds-skipped) is bitwise equal
    to the host path for both block and full-shuffle fits."""
    extra = dict(table_update="pallas", table_opt_dtype="bfloat16",
                 table_container="stacked", dedup_route="scatter")
    _fit_pair(extra, dict(batch_size=64, epochs=2, shuffle=True))
    _fit_pair(extra, dict(batch_size=64, epochs=2, shuffle="block"))


def test_device_metadata_validation():
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
              batch_size=64, vocab=80)
    cfg = make_config(**kw, device_metadata=True)
    layout, *_ = make_data(cfg, n=64, seed=0, vocab=80)
    with pytest.raises(ValueError, match="two_phase"):
        Trainer(get_model("sharedbottom", layout, cfg), seed=0)
    cfg = make_config(**kw, device_metadata=True, two_phase_embedding=True,
                      dedup_route="gather", table_update="pallas",
                      table_opt_dtype="bfloat16")
    layout, *_ = make_data(cfg, n=64, seed=0, vocab=80)
    with pytest.raises(ValueError, match="gather"):
        Trainer(get_model("sharedbottom", layout, cfg), seed=0)


@pytest.mark.skipif(
    __import__("jax").device_count() < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("explicit", [False, True])
def test_fit_device_metadata_mesh_matches_host(explicit):
    """Round 5: device_metadata on a mesh — GSPMD partitions the in-step
    sort; the explicit body computes replicated metadata from the
    all-gathered global id list.  Fits match the host-metadata mesh path
    (same program modulo metadata source; ulp-level fusion noise)."""
    from mmlrec_tpu.parallel import create_mesh

    outs = {}
    for name, dev in (("device", True), ("host", False)):
        extra = dict(two_phase_embedding=True, device_metadata=dev,
                     dedup_route="scatter")
        if explicit:
            extra.update(explicit_collective_embedding=True,
                         table_update="pallas", table_opt_dtype="bfloat16")
        cfg = make_config(
            task_name="mtl", model_name="sharedbottom", n_sparse=4,
            n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
            batch_size=64, lr=3e-3, vocab=400, **extra,
        )
        layout, x, y, _ = make_data(cfg, n=256, seed=0, vocab=400)
        tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0,
                     mesh=create_mesh(data=4, model=2)).compile()
        tr.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        import jax

        outs[name] = np.asarray(jax.device_get(
            tr.variables["params"]["embeddings"]["fused"]["table"]))
    np.testing.assert_allclose(outs["device"], outs["host"],
                               rtol=1e-5, atol=1e-7)


def test_device_metadata_checkpoint_resume(tmp_path):
    """A device_metadata + stacked run checkpoints (portable split
    layout) and resumes with continued training identical to an
    uninterrupted run — and a HOST-metadata trainer restores the same
    checkpoint to the same result (the metadata source is not part of
    the state)."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=64, lr=3e-3, two_phase_embedding=True, vocab=400,
              table_update="pallas", table_opt_dtype="bfloat16",
              table_container="stacked", dedup_route="scatter")

    def make(dev):
        cfg = make_config(**kw, device_metadata=dev)
        layout, x, y, _ = make_data(cfg, n=256, seed=0, vocab=400)
        return Trainer(
            get_model("sharedbottom", layout, cfg), seed=0).compile(), x, y

    tr_full, x, y = make(True)
    tr_full.fit(x, y, batch_size=64, epochs=2, shuffle=False, verbose=0)
    full = np.asarray(
        tr_full.variables["params"]["embeddings"]["fused"]["table"])

    tr1, x1, y1 = make(True)
    tr1.fit(x1, y1, batch_size=64, epochs=1, shuffle=False, verbose=0)
    path = tr1.save_training_state(str(tmp_path))
    tr2, x2, y2 = make(True)
    tr2.fit(x2, y2, batch_size=64, epochs=2, shuffle=False, verbose=0,
            resume_from=path)
    np.testing.assert_array_equal(
        np.asarray(tr2.variables["params"]["embeddings"]["fused"]["table"]),
        full)

    # cross-source restore: host-metadata trainer continues from the
    # device-metadata checkpoint to the identical result
    tr3, x3, y3 = make(False)
    tr3.fit(x3, y3, batch_size=64, epochs=2, shuffle=False, verbose=0,
            resume_from=path)
    np.testing.assert_array_equal(
        np.asarray(tr3.variables["params"]["embeddings"]["fused"]["table"]),
        full)


def test_fit_device_metadata_bitwise_lane_packed():
    """device_metadata with a LANE-PACKED table (pack_factor > 1: the
    production layout) — in-step metadata fits match the host path
    bitwise (vocab 4 x 2^16 -> 2^18 fused rows, P = 16 at dim 8)."""
    vocab = 1 << 16
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
              batch_size=64, lr=3e-3, vocab=vocab,
              two_phase_embedding=True, table_update="pallas",
              table_opt_dtype="bfloat16", table_container="stacked",
              dedup_route="scatter")
    outs = {}
    for name, dev in (("device", True), ("host", False)):
        cfg = make_config(**kw, device_metadata=dev)
        layout, x, y, _ = make_data(cfg, n=256, seed=0, vocab=vocab)
        tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
        tr.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=True)
        assert tr._emb_pack_factor > 1  # the packed layout really engaged
        outs[name] = np.asarray(
            tr.variables["params"]["embeddings"]["fused"]["table"])
    np.testing.assert_array_equal(outs["device"], outs["host"])
