import json
import os

import numpy as np
import pytest

from mmlrec_tpu.models import get_model
from mmlrec_tpu.parallel.multihost import host_local_batch_to_global, local_batch_size
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer


def _trainer(epochs=1, n=400):
    cfg = make_config(task_name="mtl", model_name="sharedbottom", n_sparse=3,
                      n_dense=1, hidden=(8,), tower=(4,), gate=(4,),
                      epochs=epochs, batch_size=128)
    layout, x, y, _ = make_data(cfg, n=n, seed=0)
    model = get_model("sharedbottom", layout, cfg)
    return Trainer(model, seed=0).compile(), x, y


def test_dump_history_jsonl(tmp_path):
    tr, x, y = _trainer(epochs=2)
    tr.fit(x, y, batch_size=128, epochs=2, verbose=0)
    path = str(tmp_path / "hist.jsonl")
    tr.dump_history(path)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert {"epoch", "loss", "epoch_s"} <= set(lines[0])


def test_profile_writes_trace(tmp_path):
    tr, x, y = _trainer()
    trace_dir = str(tmp_path / "trace")
    out = tr.profile(x, y, batch_size=128, steps=2, trace_dir=trace_dir)
    assert os.path.isdir(out)
    # xplane protobuf dumped under plugins/profile
    found = []
    for root, _, files in os.walk(out):
        found += [f for f in files if f.endswith(".xplane.pb")]
    assert found


def test_resume_training_from_checkpoint(tmp_path):
    tr, x, y = _trainer(epochs=2)
    tr.fit(x, y, batch_size=128, epochs=2, verbose=0)
    ckpt = tr.save_checkpoint(str(tmp_path / "ck"))

    tr2, x2, y2 = _trainer(epochs=1)
    # init variables then restore and continue training
    ids, dense = tr2.pack_inputs(x2)
    tr2.variables = tr2._init_variables(ids[:2], dense[:2])
    tr2.restore_checkpoint(ckpt)
    before = tr2.predict(x2, batch_size=128)
    tr2.fit(x2, y2, batch_size=128, epochs=1, initial_epoch=0, verbose=0)
    after = tr2.predict(x2, batch_size=128)
    assert np.isfinite(after).all()
    # training moved the params
    assert not np.allclose(before, after)


def test_multihost_helpers_single_process():
    import jax
    from mmlrec_tpu.parallel import create_mesh

    mesh = create_mesh(data=8, model=1)
    assert local_batch_size(64) == 64  # single process
    batch = (np.ones((64, 4), np.float32), None)
    g = host_local_batch_to_global(batch, mesh)
    assert g[1] is None
    assert g[0].shape == (64, 4)
    assert "data" in str(g[0].sharding.spec)


def test_full_training_state_resume(tmp_path):
    """Resume continues from saved params + optimizer state + epoch."""
    tr, x, y = _trainer(epochs=2)
    tr.fit(x, y, batch_size=128, epochs=2, verbose=0)
    ckpt = tr.save_training_state(str(tmp_path))

    tr2, x2, y2 = _trainer()
    tr2.fit(x2, y2, batch_size=128, epochs=4, resume_from=ckpt, verbose=0)
    # resumed at epoch 2 -> only 2 more epochs recorded
    assert len(tr2.history) == 2
    assert np.isfinite(tr2.history[-1]["loss"])
