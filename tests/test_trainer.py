import numpy as np
import pytest

from mmlrec_tpu.models import get_model
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer


def _fit(task_name="mtl", model_name="mmoe", n=1500, epochs=3, **kw):
    cfg = make_config(
        task_name=task_name, model_name=model_name, n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,), epochs=epochs, batch_size=128,
        lr=3e-3, **kw,
    )
    layout, x, y, _ = make_data(cfg, n=n, seed=0)
    _, xv, yv, _ = make_data(cfg, n=n // 3, seed=1)
    model = get_model(model_name, layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=128, epochs=epochs, validation_data=(xv, yv), verbose=0)
    return cfg, tr, (x, y), (xv, yv)


def test_fit_learns_signal():
    _, tr, _, (xv, yv) = _fit(epochs=6)
    assert max(h["val_auc"] for h in tr.history) > 0.62


def test_best_model_selection():
    # predictions come from the epoch with the best val AUC
    _, tr, _, (xv, yv) = _fit(epochs=4)
    best = max(h["val_auc"] for h in tr.history)
    res = tr.evaluate(xv, yv, batch_size=128)
    assert abs(res["auc"] - best) < 1e-6


def test_partial_final_batch_padded_not_recompiled():
    # n=1500 with bs=128 -> last batch has 92 rows; must still train fine
    _, tr, (x, y), _ = _fit(n=1500, epochs=1)
    assert np.isfinite(tr.history[0]["loss"])


def test_predict_shapes_and_range():
    _, tr, _, (xv, yv) = _fit(epochs=1)
    preds = tr.predict(xv, batch_size=100)  # non-divisor batch size
    assert preds.shape == (len(yv), 2)
    assert (preds >= 0).all() and (preds <= 1).all()


def test_msl_training_and_eval():
    cfg, tr, _, (xv, yv) = _fit(task_name="msl", model_name="sharedbottom",
                                num_domains=2, epochs=2)
    res = tr.evaluate(xv, yv, batch_size=128)
    assert "auc" in res  # regime_eval msl: summed preds vs y[:,0]


def test_msl_masked_loss_flag():
    cfg, tr, _, (xv, yv) = _fit(task_name="msl", model_name="sharedbottom",
                                num_domains=2, epochs=2, masked_loss=True)
    assert np.isfinite(tr.history[-1]["loss"])


def test_mtmsl_training():
    cfg, tr, _, (xv, yv) = _fit(task_name="mtmsl", model_name="mmoe",
                                num_tasks=4, num_domains=2, epochs=2)
    preds = tr.predict(xv, batch_size=128)
    assert preds.shape[1] == 4


def test_escm_training_and_predict_columns():
    cfg, tr, _, (xv, yv) = _fit(model_name="escm", epochs=2)
    preds = tr.predict(xv, batch_size=128)
    assert preds.shape[1] == 2  # [pCTR, pCTCVR] (reference basemodel.py:438-441)


def test_pcgrad_training_runs():
    cfg, tr, _, (xv, yv) = _fit(model_name="pcg", epochs=4, n=900)
    assert np.isfinite(tr.history[-1]["loss"])
    # training makes progress (PCGrad-projected grads still descend)
    assert tr.history[-1]["loss"] < tr.history[0]["loss"]


def test_layer_output_capture_through_predict():
    cfg, tr, _, (xv, yv) = _fit(model_name="mmoe", epochs=1)
    tr.update_save()
    preds, inters = tr.predict(xv, batch_size=128)
    assert "dnn_input" in inters and "expert_outputs" in inters
    assert inters["dnn_input"].shape[0] == len(preds)


def test_early_stopping(capsys):
    cfg = make_config(task_name="mtl", model_name="sharedbottom", n_sparse=3,
                      n_dense=1, hidden=(8,), tower=(4,), gate=(4,),
                      epochs=30, batch_size=256, lr=1e-2)
    cfg.optim_config.early_stop = 2
    layout, x, y, _ = make_data(cfg, n=800, seed=0)
    _, xv, yv, _ = make_data(cfg, n=300, seed=1)
    model = get_model("sharedbottom", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=256, epochs=30, validation_data=(xv, yv), verbose=0)
    assert len(tr.history) < 30  # stopped early


def test_checkpoint_roundtrip(tmp_path):
    cfg, tr, _, (xv, yv) = _fit(epochs=1)
    path = tr.save_checkpoint(str(tmp_path / "ckpt"))
    before = tr.predict(xv, batch_size=128)
    # perturb then restore
    import jax

    tr.variables = jax.tree_util.tree_map(lambda a: a * 0, tr.variables)
    tr.best_variables = tr.variables
    tr.restore_checkpoint(path)
    after = tr.predict(xv, batch_size=128)
    np.testing.assert_allclose(before, after, rtol=1e-6)


def test_seed_determinism():
    r1 = _fit(epochs=1, n=600)[1].history[0]["loss"]
    r2 = _fit(epochs=1, n=600)[1].history[0]["loss"]
    assert r1 == r2


def test_scan_steps_matches_per_step_path():
    """scan_steps (N train steps per dispatch) reproduces the per-step path
    EXACTLY — the scan body is the identical per-step program — in both
    device-data modes, including a chunk size that doesn't divide the epoch."""
    import numpy as np

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config, make_data

    for shuffle in (True, "block"):
        tables = {}
        for scan in (0, 3, True):
            kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
                      n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                      epochs=2, batch_size=128, lr=3e-3)
            if scan:
                kw["scan_steps"] = scan
            cfg = make_config(**kw)
            layout, x, y, _ = make_data(cfg, n=900, seed=0)  # 8 steps/epoch
            tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0)
            tr.compile(metrics=["auc"])
            tr.fit(x, y, batch_size=128, epochs=2, shuffle=shuffle, verbose=0)
            tables[scan] = np.asarray(
                tr.variables["params"]["embeddings"]["fused"]["table"])
        np.testing.assert_array_equal(tables[3], tables[0])
        np.testing.assert_array_equal(tables[True], tables[0])


def test_scan_steps_two_phase_pallas():
    import numpy as np

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config, make_data

    tables = {}
    for scan in (0, 4):
        # small shapes: interpret-mode pallas executes per-row DMA loops in
        # Python EVERY call (no compile cache), so work size = suite time
        kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
                  n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
                  batch_size=64, lr=3e-3, two_phase_embedding=True,
                  table_update="pallas", vocab=400)
        if scan:
            kw["scan_steps"] = scan
        cfg = make_config(**kw)
        layout, x, y, _ = make_data(cfg, n=320, seed=0, vocab=400)
        tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
        tr.fit(x, y, batch_size=64, epochs=2, verbose=0)
        tables[scan] = np.asarray(
            tr.variables["params"]["embeddings"]["fused"]["table"])
    np.testing.assert_array_equal(tables[4], tables[0])


def test_scan_steps_auto_resolution():
    """Unset scan_steps auto-enables 16-step chunks (the per-dispatch floor
    dominates chained dispatches at every state size once the embedding
    cotangent is a matmul — probe_flagship_scan.py); explicit 0 disables."""
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config, make_data

    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=1,
              batch_size=128, lr=3e-3)
    cfg = make_config(**kw)  # auto -> on everywhere
    layout, x, y, _ = make_data(cfg, n=200, seed=0)
    assert Trainer(get_model("sharedbottom", layout, cfg), seed=0)._scan_steps == 16
    cfg2 = make_config(**kw, two_phase_embedding=True, vocab=3_000_000)
    layout2, *_ = make_data(cfg2, n=200, seed=0, vocab=3_000_000)
    tr2 = Trainer(get_model("sharedbottom", layout2, cfg2), seed=0)
    assert tr2._scan_steps == 16  # 12M fused rows -> 384 MB packed table
    cfg3 = make_config(**kw, two_phase_embedding=True, vocab=3_000_000,
                       scan_steps=0)
    layout3, *_ = make_data(cfg3, n=200, seed=0, vocab=3_000_000)
    assert Trainer(get_model("sharedbottom", layout3, cfg3), seed=0)._scan_steps == 0


def test_streaming_prefetch_matches_synchronous():
    """The streaming-path prefetch worker preserves batch order, so the
    trained table is bit-identical to the synchronous loop (prefetch=1).
    The host loop is forced by zeroing the device-staging cap."""
    import numpy as np

    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config, make_data

    tables = {}
    for depth in (1, 3):
        cfg = make_config(task_name="mtl", model_name="sharedbottom",
                          n_sparse=4, n_dense=2, hidden=(16, 8), tower=(8,),
                          gate=(8,), epochs=2, batch_size=128, lr=3e-3,
                          prefetch_batches=depth, two_phase_embedding=True)
        layout, x, y, _ = make_data(cfg, n=700, seed=0)
        tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
        tr._device_data_bytes_cap = 0  # force the streaming host loop
        tr.fit(x, y, batch_size=128, epochs=2, verbose=0)
        tables[depth] = np.asarray(
            tr.variables["params"]["embeddings"]["fused"]["table"])
    np.testing.assert_array_equal(tables[3], tables[1])


def test_batch_metric_curves_opt_in():
    """batch_metric_curves=True records the reference's per-batch train
    metric curve (model/basemodel.py:316-331) from the probs the epoch
    already collects — staged, block-shuffle, and streaming paths."""
    from mmlrec_tpu.synthetic import make_config, make_data
    from mmlrec_tpu.models import get_model

    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=64, lr=3e-3, batch_metric_curves=True)
    for mode_kw, fit_kw in (
        ({}, {}),                                   # device-staged
        ({}, {"shuffle": "block"}),                 # staged block mode
        ({"two_phase_embedding": True}, {}),        # staged two-phase
        ({"streaming": True}, {}),                  # per-batch streaming
    ):
        mode_kw = dict(mode_kw)
        streaming = mode_kw.pop("streaming", False)
        cfg = make_config(**kw, **mode_kw)
        layout, x, y, _ = make_data(cfg, n=200, seed=0)  # 4 batches160+40pad
        model = get_model("sharedbottom", layout, cfg)
        tr = Trainer(model, seed=0).compile(metrics=["auc"])
        if streaming:
            tr._device_data_bytes_cap = 0  # force the streaming path
        tr.fit(x, y, batch_size=64, epochs=2, verbose=0, **fit_kw)
        assert len(tr.batch_history) == 2
        for curve in tr.batch_history:
            assert len(curve) == 4  # ceil(200/64)
            for c in curve:
                assert "auc" in c and np.isfinite(c["auc"])
        assert "batch_mean_auc" in tr.history[-1]
        # epoch batch-mean is the mean of the curve (reference semantics)
        want = float(np.mean([c["auc"] for c in tr.batch_history[-1]]))
        assert abs(tr.history[-1]["batch_mean_auc"] - want) < 1e-12

    # single-batch dataset: per-batch metric == pooled epoch metric
    cfg = make_config(**kw)
    layout, x, y, _ = make_data(cfg, n=64, seed=0)
    model = get_model("sharedbottom", layout, cfg)
    tr = Trainer(model, seed=0).compile(metrics=["auc"])
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0)
    assert abs(tr.batch_history[0][0]["auc"] - tr.history[0]["auc"]) < 1e-12
