"""MSL-regime protocol parity + the INTENDED-SEMANTICS quality column.

The mtl harness (protocol_parity.py) established ref-faithful parity; this
one measures the framework's OTHER half — "correct behavior behind flags" —
at protocol level, in the regime where the reference's bugs actually bite:

* reference msl training optimizes UNMASKED losses on all heads (the
  always-true conditional nulls domain_mask, reference
  model/basemodel.py:265-266; SURVEY §2.4.1) — per-domain masking happens
  only at final evaluation (reference main.py:135-146);
* ``masked_loss: true`` (ours) enables the intended masked semantics the
  reference spells out but never executes (basemodel.py:273-282);
* ``snr_stochastic_gates: true`` implements the per-step gate re-sampling
  the reference's authors left commented out (reference mssm.py:40),
  reviving hard-concrete dead-gate draws.

Three columns per (model, seed): reference (torch, effective = unmasked),
ours ref-faithful (default flags — must match the reference), ours
INTENDED (fixed flags — expected >= on the domain-opposed synthetic task,
where an unmasked shared head averages away per-domain signal).

Each row: per-head masked AUC [auc_0, auc_1] + total AUC (reference
main.py:135-146 semantics on both sides).

Run (resumable JSONL, CPU keeps both sides on one arithmetic):
  MMLREC_PLATFORM=cpu python benchmarks/protocol_parity_msl.py \
      --models mmoe,star --seeds 0,2,4,8 \
      --out results/protocol_parity_msl.jsonl
Summarize: --summarize results/protocol_parity_msl.jsonl
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import tempfile
import time

import numpy as np
import pandas as pd

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

if os.environ.get("MMLREC_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["MMLREC_PLATFORM"])

N_TRAIN, N_TEST = 30000, 10000
ALL_MODELS = [
    "sharedbottom", "mlp", "cross_stitch", "esmm", "escm", "mmoe", "ple",
    "snr_trans", "mssm", "star", "apg", "aitm", "hmoe", "pepnet",
]
SEEDS = [0, 2, 4, 8]
EPOCHS = 40
EARLY_STOP = 3


def make_csvs(tmpdir: str):
    """Two-domain CSVs with DOMAIN-OPPOSED signal: c2 pushes the label one
    way in scene 0 and the opposite way in scene 1, so an unmasked shared
    objective averages it to ~zero while per-domain (masked/intended)
    training can exploit it."""
    rng = np.random.default_rng(777)
    n = N_TRAIN + N_TEST
    df = pd.DataFrame()
    for i in range(6):
        df[f"c{i}"] = rng.integers(0, 50, n)
    df["scene"] = rng.integers(0, 2, n)
    df["n0"] = rng.random(n)
    df["n1"] = rng.normal(0, 1, n)
    sgn = 2 * df["scene"] - 1  # -1 / +1 per domain
    logits = (
        (df["c0"] % 7) / 3.5 - 1.0          # shared signal
        + df["n0"] * 0.8                      # shared signal
        + sgn * ((df["c2"] % 5) / 1.25 - 1.6)  # domain-OPPOSED signal
        + rng.normal(0, 1.0, n)
    )
    df["label"] = (logits > 0).astype(int)
    # second task label for the mtmsl regime (separate rng stream so the
    # msl columns above are byte-identical whether or not it exists);
    # domain-opposed via a DIFFERENT feature (c3)
    rng2 = np.random.default_rng(778)
    logits2 = (
        (df["c1"] % 5) / 2.5 - 1.0
        + df["n1"] * 0.5
        + sgn * ((df["c3"] % 4) / 1.0 - 1.5)
        + rng2.normal(0, 1.0, n)
    )
    df["label2"] = (logits2 > 0).astype(int)
    train_p = os.path.join(tmpdir, "train.csv")
    test_p = os.path.join(tmpdir, "test.csv")
    df[:N_TRAIN].to_csv(train_p, index=False)
    df[N_TRAIN:].to_csv(test_p, index=False)
    return train_p, test_p


def make_config(train_p, test_p, model_name, epochs=EPOCHS,
                early_stop=EARLY_STOP, task="msl"):
    if task == "msl":
        labels, label_cols = ["label"], ["label", "label"]
        n_heads = 2
    else:  # mtmsl: 2 tasks x 2 domains, task-major head layout
        labels = ["label", "label2"]
        label_cols = ["label", "label", "label2", "label2"]
        n_heads = 4
    data_config = {
        "data_name": f"parity_{task}",
        "train_dataset_path": train_p,
        "test_dataset_path": test_p,
        "all_columns": [f"c{i}" for i in range(6)]
        + ["scene", "n0", "n1"] + labels,
        "feature_columns": [f"c{i}" for i in range(6)],
        "dense_columns": ["n0", "n1"],
        "ignore_columns": [],
        "label_columns": label_cols,
        "num_domains": 2,
        "mask_values": [0, 1],
        "mask_column": "scene",
        "scene_feature": "scene",
    }
    return {
        "data_config": data_config,
        "model_config": {
            "task_name": task,
            "model_name": model_name,
            "task": "binary",
            "task_names": ["ctr"] * n_heads,
            "task_types": ["binary"] * n_heads,
            "emb": 8,
            "num_experts": 4,
            "expert_dnn_hidden_units": [64, 32],
            "bottom_dnn_hidden_units": [64, 32],
            "gate_dnn_hidden_units": [16],
            "tower_dnn_hidden_units": [16],
            "dnn_hidden_units": [64, 32],
            "l2_reg_linear": 0, "l2_reg_embedding": 0, "l2_reg_dnn": 0,
            "dnn_use_bn": False, "dnn_dropout": 0.0,
            "dnn_activation": "relu", "use_cka_loss": False,
        },
        "optim_config": {
            "lr": 0.001, "optimizer": "adam",
            "loss": ["binary_crossentropy"] * n_heads,
            "metrics": ["auc"], "early_stop": early_stop,
        },
        "training_config": {"train_batch_size": 1024,
                            "test_batch_size": 1024, "epochs": epochs},
        "save_config": {"save": False, "save_layer_output": False},
    }


def _masked_aucs(y, preds, test_mask):
    """Per-head AUC over that domain's rows (exactly reference
    main.py:136-144) + a total AUC over the MASK-SUMMED predictions.

    The total deliberately deviates from reference main.py:145, which sums
    ALL heads' raw predictions (its predict path nulls the domain mask,
    basemodel.py:436-437, so every row's score mixes other domains' heads);
    the mask-summed total scores each row by ITS domain's head — the
    quantity the msl regime is actually about.  Computed identically for
    all three columns, so cross-column deltas are unaffected.  The
    framework's own CSV rows (train/metrics.py::masked_test_metrics) keep
    the reference's unmasked-sum total for row-schema parity."""
    from sklearn.metrics import roc_auc_score

    out = []
    D = test_mask.shape[1]
    n_heads = preds.shape[1]
    if n_heads == D:  # msl: head i <-> domain i
        for i in range(D):
            m = test_mask[:, i] > 0
            out.append(round(float(roc_auc_score(y[m, 0], preds[m, i])), 4))
        total = (preds * test_mask).sum(axis=1)
        out.append(round(float(roc_auc_score(y[:, 0], total)), 4))
        return out
    # mtmsl: head i serves task i // D, domain i % D (reference
    # main.py:147-163); total = mean of the per-task mask-summed AUCs
    # (sklearn's multi-output average, as the reference's 2-col call does)
    T = n_heads // D
    totals = []
    for i in range(n_heads):
        m = test_mask[:, i % D] > 0
        out.append(round(float(roc_auc_score(y[m, i // D], preds[m, i])), 4))
    for t in range(T):
        tp = (preds[:, t * D:(t + 1) * D] * test_mask).sum(axis=1)
        totals.append(float(roc_auc_score(y[:, t], tp)))
    out.append(round(float(np.mean(totals)), 4))
    return out


def run_reference(config, seed):
    import random

    import torch

    sys.path.insert(0, REF)
    from utils.data_utils import ctrdataset as ref_ctrdataset

    from auc_parity import run_reference as _mtl_ref  # noqa: F401

    def ref_cls(name):
        import importlib

        mod_cls = {
            "mmoe": ("mmoe", "MMOE"), "sharedbottom": ("sharedbottom", "SharedBottom"),
            "esmm": ("esmm", "ESMM"), "ple": ("ple", "PLE"), "mlp": ("mlp", "MLP"),
            "snr_trans": ("snr_trans", "SNR_trans"), "mssm": ("mssm", "MSSM"),
            "cross_stitch": ("cross_stitch", "CrossStitch"), "hmoe": ("hmoe", "HMOE"),
            "aitm": ("aitm", "AITM"), "escm": ("escm", "ESCM"),
            "apg": ("apg", "APG"), "pepnet": ("pepnet", "PepNet"),
            "star": ("star", "STAR"),
        }[name]
        m = importlib.import_module(f"model.{mod_cls[0]}")
        return getattr(m, mod_cls[1])

    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)

    # NEWLY FOUND reference defect (documented in SURVEY §2.4.7): msl fit
    # with validation_data CRASHES at the first epoch-end evaluate —
    # fit list-converts val_x (basemodel.py:191) but predict's always-true
    # mask guard (:403, `== 'msl' or 'mtmsl' and domain_mask is None`)
    # re-derives the mask via x[mask_column] on that LIST (:408) ->
    # TypeError.  mtmsl escapes (its short-circuit sees the non-None
    # domain_mask); msl with a mask_column cannot complete `python main.py
    # --config configs_msl/*.json` as shipped.  Minimal repair honoring the
    # code's plain intent (evaluate already PASSES domain_mask_val): skip
    # the recompute when x is already a list and a mask was supplied.
    from model.basemodel import BaseModel

    if getattr(BaseModel.predict, "_msl_repair", False):
        orig_predict = BaseModel.predict._orig
    else:
        orig_predict = BaseModel.predict

    def patched_predict(self, x, batch_size=256, domain_mask=None):
        if not isinstance(x, dict) and domain_mask is not None:
            saved = self.data_config.get("mask_column", "")
            self.data_config["mask_column"] = ""
            try:
                return orig_predict(self, x, batch_size, domain_mask)
            finally:
                self.data_config["mask_column"] = saved
        return orig_predict(self, x, batch_size, domain_mask)

    patched_predict._msl_repair = True
    patched_predict._orig = orig_predict
    BaseModel.predict = patched_predict

    cfg = copy.deepcopy(config)
    train, test, test_mask, tr_in, te_in, _, dnn_cols = ref_ctrdataset(cfg)
    name = cfg["model_config"]["model_name"]
    model = ref_cls(name)(dnn_cols, device="cpu", config=cfg)
    model.compile(optimizer="adam",
                  loss=list(cfg["optim_config"]["loss"]),
                  metrics=["auc"])
    # the reference dedupes target (main.py:101 list(set(...))); its
    # reindexed df carries the label column DUPLICATED (ctrdataset reindex
    # with repeated label_columns), so train[target].values is already
    # [N, num_domains]
    target = sorted(set(cfg["data_config"]["label_columns"]))
    y_tr = np.asarray(train[target].values)
    y_te = np.asarray(test[target].values)
    if y_tr.ndim == 1:
        y_tr, y_te = y_tr[:, None], y_te[:, None]
    best = model.fit(tr_in, y_tr,
                     batch_size=cfg["training_config"]["train_batch_size"],
                     epochs=cfg["training_config"]["epochs"],
                     validation_data=(te_in, y_te))
    preds = np.asarray(best.predict(te_in, 1024))
    n_heads = len(cfg["data_config"]["label_columns"])
    preds = preds[:, :n_heads]
    D = cfg["data_config"]["num_domains"]
    # per-TASK label columns (the duplicated-column df yields task-major
    # [l, l, l2, l2]; every D-th column is one task's label)
    return _masked_aucs(y_te[:, ::D], preds, np.asarray(test_mask))


def run_ours(config, seed, intended: bool):
    from mmlrec_tpu.config import ExperimentConfig
    from mmlrec_tpu.data import ctrdataset
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.train import Trainer
    from mmlrec_tpu.utils import set_seed

    set_seed(seed)
    cfg_dict = copy.deepcopy(config)
    if intended:
        cfg_dict["model_config"]["masked_loss"] = True
        # INTENDED_NO_GATES=1 isolates masked_loss from the stochastic-gate
        # mechanism (used to attribute per-task dead-head draws in the
        # mtmsl regime — BASELINE.md round 3)
        if not os.environ.get("INTENDED_NO_GATES"):
            cfg_dict["model_config"]["snr_stochastic_gates"] = True
            # GATE_ALPHA=per_connection: Louizos-style per-connection
            # learnable keep-rate (round 4) — the fix for the scalar
            # variant's drop-connect degeneration that kills snr_trans
            # task-pairs at 4 heads (BASELINE.md stochastic-gate caveat)
            if os.environ.get("GATE_ALPHA"):
                cfg_dict["model_config"]["snr_gate_alpha"] = (
                    os.environ["GATE_ALPHA"])
            # GATE_WARMUP=E: round-5 deterministic-gate warmup epochs
            if os.environ.get("GATE_WARMUP"):
                cfg_dict["model_config"][
                    "snr_gate_noise_warmup_epochs"] = int(
                        os.environ["GATE_WARMUP"])
        cfg_dict["model_config"]["domain_bn_mode"] = "intended"
    cfg = ExperimentConfig.from_dict(cfg_dict)
    ds = ctrdataset(cfg)
    model = get_model(cfg.model_config.model_name, ds.layout, cfg)
    tr = Trainer(model, seed=seed).compile()
    tr.fit(ds.train_input, ds.y_train,
           batch_size=cfg.training_config.train_batch_size,
           epochs=cfg.training_config.epochs,
           validation_data=(ds.test_input, ds.y_test), verbose=0)
    preds = np.asarray(tr.predict(ds.test_input, 1024))
    n_heads = len(cfg.data_config.label_columns)
    D = cfg.data_config.num_domains
    y2 = tr._prepare_y(ds.y_test)  # [N, n_heads] task-major replicated
    return _masked_aucs(
        y2[:, ::D], preds[:, :n_heads], np.asarray(ds.test_mask)
    )


def summarize(path):
    rows = [json.loads(l) for l in open(path)]
    by_model = {}
    for r in rows:
        by_model.setdefault(r["model"], []).append(r)
    print("| model | seeds | ref (h0/h1/total) | ours ref-faithful | "
          "ours intended | Δ(intended - faithful) total |")
    print("|---|---|---|---|---|---|")
    for m in sorted(by_model):
        rs = [r for r in by_model[m] if r.get("ours")]
        if not rs:
            continue
        # rows carry [head_0 .. head_{H-1}, total]; msl H=2, mtmsl H=4.
        # Show the first two heads and the LAST entry (the mask-summed
        # total AUC) so the table reads the same in both regimes.
        def col(key, idx):
            vals = [r[key][idx] for r in rs if r.get(key)]
            return float(np.mean(vals)) if vals else float("nan")
        f = [col("ours", i) for i in (0, 1, -1)]
        i_ = [col("ours_intended", i) for i in (0, 1, -1)]
        ref = [col("reference", i) for i in (0, 1, -1)]
        print(f"| {m} | {len(rs)} | "
              f"{ref[0]:.4f}/{ref[1]:.4f}/{ref[2]:.4f} | "
              f"{f[0]:.4f}/{f[1]:.4f}/{f[2]:.4f} | "
              f"{i_[0]:.4f}/{i_[1]:.4f}/{i_[2]:.4f} | "
              f"{i_[2] - f[2]:+.4f} |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(ALL_MODELS))
    ap.add_argument("--seeds", default=",".join(map(str, SEEDS)))
    ap.add_argument("--epochs", type=int, default=EPOCHS)
    ap.add_argument("--early_stop", type=int, default=EARLY_STOP)
    ap.add_argument("--out", default=os.path.join(
        REPO, "results", "protocol_parity_msl.jsonl"))
    ap.add_argument("--skip_ref", action="store_true")
    ap.add_argument("--task", default="msl", choices=["msl", "mtmsl"])
    ap.add_argument("--summarize", default=None)
    args = ap.parse_args()
    if args.summarize:
        summarize(args.summarize)
        return

    import torch

    torch.set_num_threads(int(os.environ.get("OMP_NUM_THREADS", "2")))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["key"])
                except Exception:
                    pass

    tmpdir = tempfile.mkdtemp()
    train_p, test_p = make_csvs(tmpdir)
    for model_name in args.models.split(","):
        config = make_config(train_p, test_p, model_name, task=args.task,
                             epochs=args.epochs, early_stop=args.early_stop)
        for seed in [int(s) for s in args.seeds.split(",")]:
            key = f"{model_name}_seed{seed}"
            if key in done:
                print(f"skip {key} (done)", flush=True)
                continue
            row = {"key": key, "model": model_name, "seed": seed,
                   "epochs": args.epochs, "early_stop": args.early_stop}
            t0 = time.time()
            if not args.skip_ref:
                try:
                    row["reference"] = run_reference(config, seed)
                except Exception as e:
                    row["ref_error"] = f"{type(e).__name__}: {e}"[:200]
            t1 = time.time()
            try:
                row["ours"] = run_ours(config, seed, intended=False)
            except Exception as e:
                row["our_error"] = f"{type(e).__name__}: {e}"[:200]
            t2 = time.time()
            try:
                row["ours_intended"] = run_ours(config, seed, intended=True)
            except Exception as e:
                row["intended_error"] = f"{type(e).__name__}: {e}"[:200]
            row["ref_s"] = round(t1 - t0, 1)
            row["ours_s"] = round(time.time() - t2 + (t2 - t1), 1)
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
