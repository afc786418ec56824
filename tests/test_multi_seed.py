"""SeedSuiteTrainer: vmapped concurrent seed-suite training must reproduce
independent per-seed Trainer runs exactly (same init draws, shuffle
streams, early stopping, best-epoch snapshots)."""

import numpy as np
import pytest

from mmlrec_tpu.models import get_model
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer
from mmlrec_tpu.train.multi_seed import SeedSuiteTrainer


def _setup(model_name="mmoe", task_name="mtl", **kw):
    cfg = make_config(
        task_name=task_name, model_name=model_name, emb=4, n_sparse=4,
        n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64, **kw,
    )
    layout, x, y, _ = make_data(cfg, n=320, seed=0)
    _, xv, yv, _ = make_data(cfg, n=128, seed=9)
    model = get_model(model_name, layout, cfg)
    return cfg, model, x, y, xv, yv


def test_suite_matches_solo_trainers_exactly():
    seeds = [0, 2]
    cfg, model, x, y, xv, yv = _setup()
    suite = SeedSuiteTrainer(model, seeds=seeds).compile(metrics=["auc"])
    suite.fit(x, y, batch_size=64, epochs=3, validation_data=(xv, yv), verbose=0)
    suite_preds = suite.predict(xv, batch_size=64)

    for si, seed in enumerate(seeds):
        solo = Trainer(model, seed=seed).compile(metrics=["auc"])
        solo.fit(x, y, batch_size=64, epochs=3, validation_data=(xv, yv), verbose=0)
        solo_preds = solo.predict(xv, batch_size=64)
        np.testing.assert_allclose(
            suite_preds[si], solo_preds, rtol=0, atol=1e-6,
            err_msg=f"seed {seed} diverges from solo run",
        )
        assert len(suite.histories[si]) == len(solo.history)
        for h_suite, h_solo in zip(suite.histories[si], solo.history):
            assert h_suite["loss"] == pytest.approx(h_solo["loss"], rel=1e-5)
            if "val_auc" in h_solo:
                assert h_suite["val_auc"] == pytest.approx(
                    h_solo["val_auc"], abs=1e-9
                )


def test_suite_early_stopping_per_seed():
    cfg, model, x, y, xv, yv = _setup()
    cfg.optim_config.early_stop = 1
    suite = SeedSuiteTrainer(model, seeds=[0, 2]).compile(metrics=["auc"])
    suite.fit(x, y, batch_size=64, epochs=8, validation_data=(xv, yv), verbose=0)
    for si, seed in enumerate([0, 2]):
        solo = Trainer(model, seed=seed).compile(metrics=["auc"])
        solo.fit(x, y, batch_size=64, epochs=8, validation_data=(xv, yv), verbose=0)
        assert len(suite.histories[si]) == len(solo.history), seed


def test_suite_msl_regime():
    cfg, model, x, y, xv, yv = _setup(task_name="msl", model_name="sharedbottom")
    suite = SeedSuiteTrainer(model, seeds=[0, 4]).compile(metrics=["auc"])
    suite.fit(x, y, batch_size=64, epochs=2, validation_data=(xv, yv), verbose=0)
    preds = suite.predict(xv, batch_size=64)
    assert preds.shape == (2, 128, 2)
    assert np.isfinite(preds).all()
    solo = Trainer(model, seed=4).compile(metrics=["auc"])
    solo.fit(x, y, batch_size=64, epochs=2, validation_data=(xv, yv), verbose=0)
    np.testing.assert_allclose(preds[1], solo.predict(xv, 64), atol=1e-6)


def test_suite_two_phase_sequential_matches_solo():
    """Two-phase configs run the suite in sequential-shared mode (one
    Trainer, jit caches reused across seeds — multi_seed.py module
    docstring for why a stacked table can never pay); numerics per seed
    must equal solo runs exactly."""
    seeds = [0, 2]
    cfg, model, x, y, xv, yv = _setup(two_phase_embedding=True)
    suite = SeedSuiteTrainer(model, seeds=seeds).compile(metrics=["auc"])
    assert suite.sequential
    suite.fit(x, y, batch_size=64, epochs=3, validation_data=(xv, yv),
              verbose=0)
    suite_preds = suite.predict(xv, batch_size=64)
    assert suite_preds.shape[0] == 2
    for si, seed in enumerate(seeds):
        solo = Trainer(model, seed=seed).compile(metrics=["auc"])
        solo.fit(x, y, batch_size=64, epochs=3, validation_data=(xv, yv),
                 verbose=0)
        np.testing.assert_allclose(
            suite_preds[si], solo.predict(xv, batch_size=64), rtol=0,
            atol=1e-6, err_msg=f"seed {seed} diverges from solo two-phase run",
        )
        assert len(suite.histories[si]) == len(solo.history)
        for h_suite, h_solo in zip(suite.histories[si], solo.history):
            assert h_suite["loss"] == pytest.approx(h_solo["loss"], rel=1e-5)


def test_suite_two_phase_pallas_sequential():
    """Sequential suite on the production kernel path (pallas interpret on
    CPU + packed bf16 moments) stays finite and per-seed-shaped."""
    cfg, model, x, y, xv, yv = _setup(
        two_phase_embedding=True, table_update="pallas",
        table_opt_dtype="bfloat16",
    )
    suite = SeedSuiteTrainer(model, seeds=[0, 4]).compile(metrics=["auc"])
    suite.fit(x, y, batch_size=64, epochs=1, validation_data=(xv, yv),
              verbose=0)
    preds = suite.predict(xv, batch_size=64)
    assert preds.shape == (2, 128, 2)
    assert np.isfinite(preds).all()
