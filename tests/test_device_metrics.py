"""On-device metrics (train/device_metrics.py) must match the sklearn host
path (train/metrics.py) for every regime, including ties, padding weights,
and the fused fit()-time eval program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

from mmlrec_tpu.models import get_model
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer
from mmlrec_tpu.train.device_metrics import (
    regime_metrics,
    supports,
    weighted_auc,
)
from mmlrec_tpu.train.metrics import get_metric_fns, regime_eval


def test_weighted_auc_matches_sklearn():
    rng = np.random.RandomState(0)
    y = rng.randint(0, 2, 4096).astype(np.float32)
    s = rng.rand(4096).astype(np.float32)
    w = np.ones(4096, np.float32)
    ours = float(weighted_auc(jnp.asarray(y), jnp.asarray(s), jnp.asarray(w)))
    assert ours == pytest.approx(roc_auc_score(y, s), abs=1e-6)


def test_weighted_auc_with_ties():
    rng = np.random.RandomState(1)
    y = rng.randint(0, 2, 2000).astype(np.float32)
    # heavy ties: scores quantized to 8 distinct values
    s = (rng.randint(0, 8, 2000) / 8.0).astype(np.float32)
    w = np.ones(2000, np.float32)
    ours = float(weighted_auc(jnp.asarray(y), jnp.asarray(s), jnp.asarray(w)))
    assert ours == pytest.approx(roc_auc_score(y, s), abs=1e-6)


def test_weighted_auc_zero_weight_rows_excluded():
    rng = np.random.RandomState(2)
    y = rng.randint(0, 2, 1000).astype(np.float32)
    s = rng.rand(1000).astype(np.float32)
    w = (rng.rand(1000) > 0.3).astype(np.float32)
    keep = w.astype(bool)
    ours = float(weighted_auc(jnp.asarray(y), jnp.asarray(s), jnp.asarray(w)))
    assert ours == pytest.approx(roc_auc_score(y[keep], s[keep]), abs=1e-6)


def test_supports():
    assert supports(["auc", "acc"])
    assert supports(["auc", "mse", "accuracy"])
    assert not supports(["auc", "logloss"])
    assert not supports([])


@pytest.mark.parametrize(
    "task_name,num_domains,n_heads,n_labels",
    [("mtl", 1, 2, 2), ("msl", 3, 3, 3), ("mtmsl", 2, 4, 4)],
)
def test_regime_metrics_match_host(task_name, num_domains, n_heads, n_labels):
    rng = np.random.RandomState(3)
    n = 2048
    y = rng.randint(0, 2, (n, n_labels)).astype(np.float32)
    p = rng.rand(n, n_heads).astype(np.float32)
    w = np.ones(n, np.float32)

    host = regime_eval(
        get_metric_fns(["auc", "acc", "mse"]), y.astype(np.float64),
        p.astype(np.float64), task_name, num_domains,
    )
    dev = jax.jit(
        lambda yy, pp, ww: regime_metrics(
            ("auc", "acc", "mse"), yy, pp, ww, task_name, num_domains
        )
    )(jnp.asarray(y), jnp.asarray(p), jnp.asarray(w))
    for k in host:
        assert float(dev[k]) == pytest.approx(host[k], abs=2e-5), (task_name, k)


def test_msl_auc_survives_init_scale_spread():
    """At early training the per-head sigmoids sit within ~1e-7 of 0.5;
    a plain f32 head-sum lands near 1.0 where the ulp is 1.2e-7 and ties
    everything (device AUC collapsed to exactly 0.5 on TPU).  The centered
    sum (regime_effective(center=True)) must preserve the ordering."""
    rng = np.random.RandomState(7)
    n = 4096
    spread = (rng.randn(n, 2) * 3e-8).astype(np.float32)
    p = (0.5 + spread).astype(np.float32)
    y = rng.randint(0, 2, (n, 1)).astype(np.float32)
    # the collapse premise: plain f32 sums are (almost) all the same value
    assert len(np.unique(p.sum(axis=1, dtype=np.float32))) < 10
    expected = roc_auc_score(y[:, 0], p.astype(np.float64).sum(axis=1))
    dev = regime_metrics(("auc",), jnp.asarray(np.repeat(y, 2, 1)),
                         jnp.asarray(p), jnp.ones(n, jnp.float32), "msl", 2)
    assert float(dev["auc"]) == pytest.approx(expected, abs=1e-4)


def test_regime_metrics_padding_matches_unpadded():
    rng = np.random.RandomState(4)
    n, pad = 1000, 24
    y = rng.randint(0, 2, (n, 2)).astype(np.float32)
    p = rng.rand(n, 2).astype(np.float32)
    y_pad = np.concatenate([y, np.repeat(y[-1:], pad, axis=0)])
    p_pad = np.concatenate([p, np.repeat(p[-1:], pad, axis=0)])
    w = np.concatenate([np.ones(n), np.zeros(pad)]).astype(np.float32)

    base = regime_metrics(("auc", "acc"), jnp.asarray(y), jnp.asarray(p),
                          jnp.ones(n, jnp.float32), "mtl", 1)
    padded = regime_metrics(("auc", "acc"), jnp.asarray(y_pad),
                            jnp.asarray(p_pad), jnp.asarray(w), "mtl", 1)
    for k in base:
        assert float(base[k]) == pytest.approx(float(padded[k]), abs=1e-6)


def _fit_two(model_name, task_name, device_eval, epochs=3):
    cfg = make_config(
        task_name=task_name, model_name=model_name, emb=4, n_sparse=4,
        n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
    )
    cfg.training_config.extra["device_eval"] = device_eval
    layout, x, y, _ = make_data(cfg, n=448, seed=0)
    _, xv, yv, _ = make_data(cfg, n=200, seed=9)  # 200 % 64 != 0: pads
    model = get_model(model_name, layout, cfg)
    tr = Trainer(model, seed=0).compile(metrics=["auc", "acc"])
    tr.fit(x, y, batch_size=64, epochs=epochs, validation_data=(xv, yv),
           verbose=0)
    return tr


@pytest.mark.parametrize("model_name,task_name", [("mmoe", "mtl"), ("star", "msl")])
def test_fit_device_eval_matches_host_eval(model_name, task_name):
    host = _fit_two(model_name, task_name, device_eval=False)
    dev = _fit_two(model_name, task_name, device_eval=True)
    assert len(host.history) == len(dev.history)
    for hh, hd in zip(host.history, dev.history):
        # msl sums the per-head probabilities in f32 on device but f64 on
        # host; near-equal sums can swap/tie in the ranking, moving the AUC
        # by ~1 pair (1/(P*N) ~ 1e-4 at N=200) — precision artifact, not a
        # formula difference (the same-precision unit tests above pin 1e-6)
        assert hd["val_auc"] == pytest.approx(hh["val_auc"], abs=5e-4)
        assert hd["val_acc"] == pytest.approx(hh["val_acc"], abs=5e-4)
        assert hd["loss"] == pytest.approx(hh["loss"], rel=1e-6)


def test_fit_device_eval_escm_column_select():
    host = _fit_two("escm", "mtl", device_eval=False)
    dev = _fit_two("escm", "mtl", device_eval=True)
    for hh, hd in zip(host.history, dev.history):
        assert hd["val_auc"] == pytest.approx(hh["val_auc"], abs=2e-5)


def test_seed_suite_device_eval_matches_host():
    from mmlrec_tpu.train.multi_seed import SeedSuiteTrainer

    def run(device_eval):
        cfg = make_config(
            task_name="mtl", model_name="mmoe", emb=4, n_sparse=4, n_dense=2,
            hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
        )
        cfg.training_config.extra["device_eval"] = device_eval
        layout, x, y, _ = make_data(cfg, n=448, seed=0)
        _, xv, yv, _ = make_data(cfg, n=200, seed=9)
        model = get_model("mmoe", layout, cfg)
        suite = SeedSuiteTrainer(model, seeds=[0, 2]).compile(metrics=["auc", "acc"])
        suite.fit(x, y, batch_size=64, epochs=3, validation_data=(xv, yv), verbose=0)
        return suite

    host, dev = run(False), run(True)
    for si in range(2):
        assert len(host.histories[si]) == len(dev.histories[si])
        for hh, hd in zip(host.histories[si], dev.histories[si]):
            assert hd["val_auc"] == pytest.approx(hh["val_auc"], abs=5e-4)
            assert hd["val_acc"] == pytest.approx(hh["val_acc"], abs=5e-4)


@pytest.mark.parametrize(
    "model_name,task_name", [("mmoe", "mtl"), ("star", "msl"), ("escm", "mtl")]
)
def test_masked_test_metrics_device_matches_host(model_name, task_name):
    from mmlrec_tpu.data import get_test_mask
    from mmlrec_tpu.train.metrics import masked_test_metrics

    cfg = make_config(
        task_name=task_name, model_name=model_name, emb=4, n_sparse=4,
        n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
    )
    layout, x, y, _ = make_data(cfg, n=448, seed=0)
    _, xt, yt, _ = make_data(cfg, n=200, seed=9)
    dc = cfg.data_config
    test_mask = None
    if task_name in ("msl", "mtmsl"):
        test_mask = get_test_mask(xt[dc.mask_column], dc.mask_values,
                                  dc.num_domains)
    model = get_model(model_name, layout, cfg)
    tr = Trainer(model, seed=0).compile(metrics=["auc"])
    tr.fit(x, y, batch_size=64, epochs=2, verbose=0)

    preds = tr.predict(xt, batch_size=64)
    host = masked_test_metrics(
        tr._prepare_y(yt), preds, task_name, dc.num_domains, test_mask,
        tr.model.task_types,
    )
    dev = tr.masked_test_metrics_device(xt, yt, test_mask, batch_size=64)
    assert set(dev) == set(host)
    for k in host:
        assert dev[k] == pytest.approx(host[k], abs=1e-3), k


def test_suite_masked_test_metrics_device_matches_host():
    from mmlrec_tpu.data import get_test_mask
    from mmlrec_tpu.train.metrics import masked_test_metrics
    from mmlrec_tpu.train.multi_seed import SeedSuiteTrainer

    cfg = make_config(
        task_name="msl", model_name="mmoe", emb=4, n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
    )
    layout, x, y, _ = make_data(cfg, n=448, seed=0)
    _, xt, yt, _ = make_data(cfg, n=200, seed=9)
    dc = cfg.data_config
    test_mask = get_test_mask(xt[dc.mask_column], dc.mask_values, dc.num_domains)
    model = get_model("mmoe", layout, cfg)
    suite = SeedSuiteTrainer(model, seeds=[0, 2]).compile(metrics=["auc"])
    suite.fit(x, y, batch_size=64, epochs=2, validation_data=(xt, yt), verbose=0)

    dev_rows = suite.masked_test_metrics_device(xt, yt, test_mask, batch_size=64)
    preds = suite.predict(xt, batch_size=64)
    y_test = suite.tr._prepare_y(yt)
    for si in range(2):
        host = masked_test_metrics(
            y_test, preds[si], "msl", dc.num_domains, test_mask,
            suite.tr.model.task_types,
        )
        assert set(dev_rows[si]) == set(host)
        for k in host:
            assert dev_rows[si][k] == pytest.approx(host[k], abs=1e-3), (si, k)


def test_recompile_clears_cached_programs():
    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=4, n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
    )
    cfg.training_config.extra["device_eval"] = True
    layout, x, y, _ = make_data(cfg, n=256, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile(metrics=["auc"])
    tr.fit(x, y, batch_size=64, epochs=1, validation_data=(x, y), verbose=0)
    assert "val_acc" not in tr.history[-1]
    tr.compile(metrics=["auc", "acc"])  # must drop the cached eval program
    tr.fit(x, y, batch_size=64, epochs=1, validation_data=(x, y), verbose=0)
    assert "val_acc" in tr.history[-1]


def test_init_time_hyperparam_rejected():
    from mmlrec_tpu.train.sweep import GridSweepTrainer

    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=4, n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
    )
    layout, *_ = make_data(cfg, n=64, seed=0)
    model = get_model("mmoe", layout, cfg)
    with pytest.raises(ValueError, match="INIT"):
        GridSweepTrainer(
            model,
            grid=[{"seed": 0, "lr": 1e-3, "initial_accumulator_value": 0.5}],
        )


def test_device_eval_falls_back_on_unsupported_metric():
    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=4, n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64,
    )
    cfg.training_config.extra["device_eval"] = True
    layout, x, y, _ = make_data(cfg, n=256, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile(metrics=["auc", "logloss"])
    assert not tr._use_device_eval()
    tr.fit(x, y, batch_size=64, epochs=1, validation_data=(x, y), verbose=0)
    assert "val_logloss" in tr.history[-1] or "val_binary_crossentropy" in tr.history[-1]
