"""GridSweepTrainer: a vmapped (seed x lr) grid must reproduce solo
Trainer runs at each combo's seed and learning rate exactly."""

import numpy as np
import pytest

from mmlrec_tpu.models import get_model
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer
from mmlrec_tpu.train.optimizers import get_optimizer
from mmlrec_tpu.train.sweep import GridSweepTrainer, injectable_optimizer


def _setup(model_name="mmoe", task_name="mtl"):
    cfg = make_config(
        task_name=task_name, model_name=model_name, emb=4, n_sparse=4,
        n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
    )
    layout, x, y, _ = make_data(cfg, n=320, seed=0)
    _, xv, yv, _ = make_data(cfg, n=128, seed=9)
    model = get_model(model_name, layout, cfg)
    return cfg, model, x, y, xv, yv


def test_grid_matches_solo_trainers():
    cfg, model, x, y, xv, yv = _setup()
    sweep = GridSweepTrainer(model, seeds=[0, 2], lrs=[1e-3, 1e-2]).compile(
        metrics=["auc"]
    )
    assert len(sweep.grid) == 4
    sweep.fit(x, y, batch_size=64, epochs=3, validation_data=(xv, yv), verbose=0)
    preds = sweep.predict(xv, batch_size=64)

    for i, g in enumerate(sweep.grid):
        solo = Trainer(model, seed=g["seed"]).compile(
            optimizer=get_optimizer("adam", g["lr"]), metrics=["auc"]
        )
        solo.fit(x, y, batch_size=64, epochs=3, validation_data=(xv, yv), verbose=0)
        np.testing.assert_allclose(
            preds[i], solo.predict(xv, batch_size=64), atol=1e-6,
            err_msg=f"combo {g} diverges from solo run",
        )
        for h_sweep, h_solo in zip(sweep.histories[i], solo.history):
            assert h_sweep["loss"] == pytest.approx(h_solo["loss"], rel=1e-5)


def test_lrs_actually_differ_across_combos():
    cfg, model, x, y, xv, yv = _setup()
    sweep = GridSweepTrainer(model, seeds=[0], lrs=[1e-5, 1e-2]).compile()
    sweep.fit(x, y, batch_size=64, epochs=2, verbose=0)
    p = sweep.predict(xv, batch_size=64)
    # same seed, 1000x lr apart -> different trained params
    assert np.abs(p[0] - p[1]).max() > 1e-4


def test_results_summary():
    cfg, model, x, y, xv, yv = _setup()
    sweep = GridSweepTrainer(model, seeds=[0], lrs=[1e-3, 3e-3]).compile(
        metrics=["auc"]
    )
    sweep.fit(x, y, batch_size=64, epochs=2, validation_data=(xv, yv), verbose=0)
    rows = sweep.results()
    assert len(rows) == 2
    for r in rows:
        assert 0.0 < r["best_val_auc"] <= 1.0
        assert r["epochs"] == 2


def test_injectable_matches_plain_optimizer():
    import jax.numpy as jnp

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    grads = {"w": jnp.full((4,), 0.5), "b": jnp.full((2,), -1.0)}
    for name in ["adam", "adagrad", "sgd", "rmsprop"]:
        plain = get_optimizer(name, 3e-3)
        inj = injectable_optimizer(name, 3e-3)
        sp, si = plain.init(params), inj.init(params)
        p1, p2 = params, params
        for _ in range(3):
            u1, sp = plain.update(grads, sp, p1)
            u2, si = inj.update(grads, si, p2)
            import optax

            p1 = optax.apply_updates(p1, u1)
            p2 = optax.apply_updates(p2, u2)
        np.testing.assert_allclose(p1["w"], p2["w"], atol=1e-7, err_msg=name)


def test_grid_requires_lrs():
    cfg, model, *_ = _setup()
    with pytest.raises(ValueError):
        GridSweepTrainer(model, seeds=[0])


def test_multi_hyperparam_grid_matches_solo():
    import optax

    cfg, model, x, y, xv, yv = _setup()
    grid = [
        {"seed": 0, "lr": 3e-3, "b1": 0.9},
        {"seed": 0, "lr": 3e-3, "b1": 0.5},
    ]
    sweep = GridSweepTrainer(model, grid=grid).compile(metrics=["auc"])
    sweep.fit(x, y, batch_size=64, epochs=3, validation_data=(xv, yv), verbose=0)
    preds = sweep.predict(xv, batch_size=64)

    for i, g in enumerate(grid):
        solo = Trainer(model, seed=g["seed"]).compile(
            optimizer=optax.adam(g["lr"], b1=g["b1"], b2=0.999, eps=1e-8),
            metrics=["auc"],
        )
        solo.fit(x, y, batch_size=64, epochs=3, validation_data=(xv, yv), verbose=0)
        np.testing.assert_allclose(
            preds[i], solo.predict(xv, batch_size=64), atol=1e-6,
            err_msg=f"combo {g} diverges from solo run",
        )
    assert np.abs(preds[0] - preds[1]).max() > 1e-5  # b1 actually varied


def test_unknown_hyperparam_raises():
    cfg, model, x, y, *_ = _setup()
    sweep = GridSweepTrainer(
        model, grid=[{"seed": 0, "lr": 1e-3, "nonsense": 1.0}]
    ).compile()
    with pytest.raises(KeyError):
        sweep.fit(x, y, batch_size=64, epochs=1, verbose=0)


def test_sequential_grid_two_phase_matches_solo():
    """Two-phase (sparse-table) grids run sequential-shared grouped by lr;
    every combo must equal a solo Trainer run at that (seed, lr)."""
    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=4, n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
        two_phase_embedding=True,
    )
    layout, x, y, _ = make_data(cfg, n=320, seed=0)
    _, xv, yv, _ = make_data(cfg, n=128, seed=9)
    model = get_model("mmoe", layout, cfg)
    sweep = GridSweepTrainer(model, seeds=[0, 2], lrs=[1e-3, 1e-2]).compile(
        metrics=["auc"]
    )
    assert sweep.sequential
    sweep.fit(x, y, batch_size=64, epochs=2, validation_data=(xv, yv), verbose=0)
    preds = sweep.predict(xv, batch_size=64)
    rows = sweep.results()
    assert len(rows) == 4

    for i, g in enumerate(sweep.grid):
        solo_cfg = make_config(
            task_name="mtl", model_name="mmoe", emb=4, n_sparse=4, n_dense=2,
            hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
            two_phase_embedding=True, lr=g["lr"],
        )
        solo_model = get_model("mmoe", layout, solo_cfg)
        solo = Trainer(solo_model, seed=g["seed"]).compile(metrics=["auc"])
        solo.fit(x, y, batch_size=64, epochs=2, validation_data=(xv, yv),
                 verbose=0)
        np.testing.assert_allclose(
            preds[i], solo.predict(xv, batch_size=64), atol=1e-6,
            err_msg=f"combo {g} diverges from solo two-phase run",
        )
        for h_sweep, h_solo in zip(sweep.histories[i], solo.history):
            assert h_sweep["loss"] == pytest.approx(h_solo["loss"], rel=1e-5)


def test_sequential_grid_rejects_non_lr_hyperparams():
    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=4, n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
        two_phase_embedding=True,
    )
    layout, x, y, _ = make_data(cfg, n=128, seed=0)
    model = get_model("mmoe", layout, cfg)
    with pytest.raises(NotImplementedError):
        GridSweepTrainer(
            model, grid=[{"seed": 0, "lr": 1e-3, "b1": 0.9}]
        )
