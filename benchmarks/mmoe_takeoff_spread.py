"""MMoE task-2 "takeoff" spread: fixed init, varied shuffle order.

BASELINE.md's AUC-parity table shows mmoe/mssm/sharedbottom seeds where the
reference reaches its task-2 takeoff 1-2 epochs earlier at a FIXED 10-epoch
budget (parity holds at convergence; init-scale audit matches exactly).  The
remaining hypothesis is that takeoff timing from the tiny (1e-4 std) init is
batch-ORDER stochasticity, not a systematic optimizer/loss difference.

Decisive test: hold the init fixed (seed 0 on both sides) and vary ONLY the
shuffle stream.  If each implementation's own takeoff epoch varies across
shuffle seeds by at least the observed cross-implementation gap, the spread
is shuffle noise and the roadmap item closes.

Run: MMLREC_PLATFORM=cpu python benchmarks/mmoe_takeoff_spread.py
"""
from __future__ import annotations

import copy
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

from auc_parity import REF, make_config, make_csvs  # noqa: E402

EPOCHS = 10
SHUFFLE_SEEDS = [0, 101, 202, 303, 404]
INIT_SEEDS = [0, 11, 22, 33, 44]


def takeoff_epoch(curve, thresh=0.65):
    for i, a in enumerate(curve):
        if a >= thresh:
            return i
    return len(curve)  # never took off in budget


def run_ours_curve(config, shuffle_seed, init_seed=0):
    from sklearn.metrics import roc_auc_score

    from mmlrec_tpu.config import ExperimentConfig
    from mmlrec_tpu.data import ctrdataset
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.train import Trainer
    from mmlrec_tpu.utils import set_seed

    set_seed(init_seed)
    cfg = ExperimentConfig.from_dict(copy.deepcopy(config))
    cfg.optim_config.early_stop = EPOCHS + 1  # run the full budget
    ds = ctrdataset(cfg)
    model = get_model("mmoe", ds.layout, cfg)
    tr = Trainer(model, seed=init_seed).compile()
    # initialize params with seed 0 BEFORE switching the seed that drives the
    # shuffle rng (trainer.py rng_np = default_rng(self.seed)); dropout is 0
    # so the training PRNGKey stream is inert
    ids, dense = tr.pack_inputs(ds.train_input)
    tr.variables = tr._init_variables(ids[:2], dense[:2])
    tr.seed = 9000 + shuffle_seed

    curve = []

    def cb(epoch, trainer):
        preds = trainer.predict(ds.test_input, 1024)
        curve.append(round(float(roc_auc_score(ds.y_test[:, 1], preds[:, 1])), 4))

    tr.fit(ds.train_input, ds.y_train, batch_size=1024, epochs=EPOCHS,
           validation_data=(ds.test_input, ds.y_test), verbose=0,
           epoch_callback=cb)
    return curve


def run_reference_curve(config, shuffle_seed, init_seed=0):
    import random

    import torch
    from sklearn.metrics import roc_auc_score

    sys.path.insert(0, REF)
    from model.mmoe import MMOE
    from utils.data_utils import ctrdataset as ref_ctrdataset

    random.seed(init_seed)
    np.random.seed(init_seed)
    torch.manual_seed(init_seed)
    cfg = copy.deepcopy(config)
    cfg["optim_config"]["early_stop"] = EPOCHS + 1
    train, test, _, tr_in, te_in, _, dnn_cols = ref_ctrdataset(cfg)
    model = MMOE(dnn_cols, device="cpu", config=cfg)  # init consumes seed-0 RNG
    model.compile(optimizer="adam",
                  loss=["binary_crossentropy", "binary_crossentropy"],
                  metrics=["auc"])
    torch.manual_seed(shuffle_seed)  # vary ONLY the DataLoader shuffle stream
    target = ["label", "label2"]
    curve = []
    for _ in range(EPOCHS):  # optimizer persists on the model across fit calls
        model.fit(tr_in, train[target].values, batch_size=1024, epochs=1,
                  validation_data=(te_in, test[target].values))
        preds = model.predict(te_in, 1024)
        curve.append(round(float(
            roc_auc_score(test[target[1]].values, preds[:, 1])), 4))
    return curve


def main():
    vary = sys.argv[1] if len(sys.argv) > 1 else "shuffle"
    tmpdir = tempfile.mkdtemp()
    train_p, test_p = make_csvs(tmpdir)
    config = make_config(train_p, test_p, "mmoe")
    out = {"ours": {}, "reference": {}}
    seeds = SHUFFLE_SEEDS if vary == "shuffle" else INIT_SEEDS
    for s in seeds:
        kw = {"shuffle_seed": s} if vary == "shuffle" else {
            "shuffle_seed": 0, "init_seed": s}
        c = run_ours_curve(config, **kw)
        out["ours"][s] = {"curve": c, "takeoff": takeoff_epoch(c)}
        print(json.dumps({f"ours_{vary}{s}": out["ours"][s]}), flush=True)
    for s in seeds:
        kw = {"shuffle_seed": s} if vary == "shuffle" else {
            "shuffle_seed": 0, "init_seed": s}
        c = run_reference_curve(config, **kw)
        out["reference"][s] = {"curve": c, "takeoff": takeoff_epoch(c)}
        print(json.dumps({f"ref_{vary}{s}": out["reference"][s]}), flush=True)
    t_ours = [v["takeoff"] for v in out["ours"].values()]
    t_ref = [v["takeoff"] for v in out["reference"].values()]
    print(json.dumps({
        "takeoff_epochs_ours": t_ours,
        "takeoff_epochs_reference": t_ref,
        "spread_ours": max(t_ours) - min(t_ours),
        "spread_reference": max(t_ref) - min(t_ref),
    }, indent=2))


if __name__ == "__main__":
    main()
