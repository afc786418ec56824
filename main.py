"""Experiment driver (reference main.py:71-181).

Usage mirrors the reference:

    python main.py --config configs_mtl/config_census.json \
        [--model_name mmoe --run true] [--seed S] [--seeds 0,2,4,8] \
        [--data_parallel N] [--model_parallel M] [--synthetic]

Differences: --device is unnecessary (JAX picks TPU/CPU); --is_parallel is
replaced by real mesh flags; --synthetic trains on generated data with the
config's schema shapes (the reference datasets are external downloads,
reference README.md:31-43); unknown model names raise instead of returning
None.
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

if os.environ.get("MMLREC_PLATFORM"):
    # explicit platform override (the environment may pin a TPU PJRT plugin
    # that ignores JAX_PLATFORMS; see tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", os.environ["MMLREC_PLATFORM"])

from mmlrec_tpu.config import ExperimentConfig
from mmlrec_tpu.models import get_model
from mmlrec_tpu.train import Trainer, resolve_table_container
from mmlrec_tpu.train.metrics import masked_test_metrics
from mmlrec_tpu.utils import append_result_row, set_seed


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=None,
                   help="single seed; default runs the reference seed suite")
    p.add_argument("--seeds", type=str, default="0,2,4,8",
                   help="comma-separated seed list (reference main.py:85)")
    p.add_argument("--run", type=bool, default=False)
    p.add_argument("--model_name", type=str, default="")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="data mesh axis size (0 = no mesh)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="model (embedding-shard) mesh axis size")
    p.add_argument("--synthetic", action="store_true",
                   help="use synthetic data with the config's schema")
    p.add_argument("--synthetic_rows", type=int, default=20000)
    p.add_argument("--synthetic_vocab", type=int, default=100,
                   help="per-feature vocabulary for --synthetic data")
    p.add_argument("--vmap_seeds", action="store_true",
                   help="train the whole seed suite CONCURRENTLY as one "
                        "vmapped program (train/multi_seed.py) instead of "
                        "the reference's sequential seed loop")
    p.add_argument("--sweep_lrs", type=str, default="",
                   help="comma-separated lr list: train the full "
                        "(seeds x lrs) grid CONCURRENTLY as one vmapped "
                        "program (train/sweep.py) and report per-combo rows")
    p.add_argument("--device_eval", action="store_true",
                   help="compute validation metrics on device inside the "
                        "fused eval program (train/device_metrics.py): only "
                        "scalars cross the host boundary instead of the "
                        "[N_test, heads] prediction matrix")
    p.add_argument("--export_bundle", type=str, default="",
                   help="after training, export a self-contained serving "
                        "bundle (StableHLO + params + packing schema) to "
                        "<dir>/<data>_<task>_<model>_<seed>/")
    return p.parse_args()


def load_dataset(cfg: ExperimentConfig, args):
    if args.synthetic:
        from mmlrec_tpu.data import CTRDataset, get_test_mask
        from mmlrec_tpu.synthetic import make_data

        n_train, n_test = args.synthetic_rows, max(args.synthetic_rows // 4, 1000)
        v = args.synthetic_vocab
        layout, x_tr, y_tr, _ = make_data(cfg, n=n_train, seed=0, vocab=v)
        _, x_te, y_te, _ = make_data(cfg, n=n_test, seed=1, vocab=v)
        dc = cfg.data_config
        test_mask = None
        if cfg.model_config.task_name in ("msl", "mtmsl") and dc.mask_column:
            test_mask = get_test_mask(x_te[dc.mask_column], dc.mask_values, dc.num_domains)
        return CTRDataset(
            train_input=x_tr, test_input=x_te, y_train=y_tr, y_test=y_te,
            test_mask=test_mask, feature_columns=layout.feature_columns,
            layout=layout,
        )
    from mmlrec_tpu.data import ctrdataset

    return ctrdataset(cfg)


def main():
    args = parse_args()
    seeds = [args.seed] if args.seed is not None else [int(s) for s in args.seeds.split(",")]

    mesh = None
    if args.data_parallel:
        from mmlrec_tpu.parallel import create_mesh

        mesh = create_mesh(data=args.data_parallel, model=args.model_parallel)

    if args.sweep_lrs and mesh is None:
        lrs = [float(v) for v in args.sweep_lrs.split(",")]
        return run_vmapped_suite(args, seeds, lrs=lrs)
    if args.vmap_seeds and len(seeds) > 1 and mesh is None:
        return run_vmapped_suite(args, seeds)

    for seed in seeds:
        print("seed:", seed)
        set_seed(seed)
        cfg = ExperimentConfig.from_file(args.config)
        if args.run and args.model_name:
            cfg.model_config.model_name = args.model_name
        if args.device_eval:
            cfg.training_config.extra["device_eval"] = True
        mc, dc, oc, tc, sc = (
            cfg.model_config, cfg.data_config, cfg.optim_config,
            cfg.training_config, cfg.save_config,
        )
        print(cfg.to_dict())

        ds = load_dataset(cfg, args)
        # production default: stacked table+moment container whenever the
        # pallas update will engage (1.33x at 40M x 32; explicit
        # table_container in the config always wins)
        resolve_table_container(cfg, ds.layout, mesh=mesh)
        if mc.extra.get("table_container") == "stacked":
            print("table_container: stacked (auto — pallas dual-write path)")
        model = get_model(mc.model_name, ds.layout, cfg)
        trainer = Trainer(model, seed=seed, mesh=mesh).compile(
            optimizer=oc.optimizer, loss=oc.loss, metrics=oc.metrics
        )
        shuffle = tc.extra.get("shuffle_mode", "full")
        trainer.fit(
            ds.train_input,
            ds.y_train,
            batch_size=tc.train_batch_size,
            epochs=tc.epochs,
            validation_data=(ds.test_input, ds.y_test),
            shuffle="block" if shuffle == "block" else True,
        )

        if sc.save_layer_output:
            trainer.update_save()
            pred_ans, layer_output_dict = trainer.predict(ds.test_input, tc.test_batch_size)
            for key, value in layer_output_dict.items():
                file_name = (
                    dc.layer_output_path
                    + f"{mc.model_name}_l2{mc.l2_reg_dnn}_{key}.pkl"
                )
                with open(file_name, "wb") as f:
                    pickle.dump(value, f)
        elif args.device_eval:
            pred_ans = None  # fused on-device final metrics, no download
        else:
            pred_ans = trainer.predict(ds.test_input, tc.test_batch_size)

        if pred_ans is None:
            results = trainer.masked_test_metrics_device(
                ds.test_input, ds.y_test, ds.test_mask, tc.test_batch_size
            )
        else:
            y_test = trainer._prepare_y(ds.y_test)
            results = masked_test_metrics(
                y_test, pred_ans, mc.task_name, dc.num_domains, ds.test_mask,
                trainer.model.task_types,
            )
        model_type = f"{dc.data_name}_{mc.task_name}_{mc.model_name}_{seed}"
        row = {"type": model_type, **results}
        if trainer.throughput_examples_per_s:
            row["examples_per_s"] = round(trainer.throughput_examples_per_s, 1)
        print(row)
        append_result_row(dc.test_result_path, row)

        if args.export_bundle:
            from mmlrec_tpu.serving import save_serving_bundle

            bundle_dir = os.path.join(args.export_bundle, model_type)
            meta = save_serving_bundle(trainer, bundle_dir)
            print(f"serving bundle -> {bundle_dir} "
                  f"(batch_mode={meta['batch_mode']})")


def run_vmapped_suite(args, seeds, lrs=None):
    """All seeds (optionally x lrs) at once: one vmapped train program,
    per-combo CSV rows (same row schema as the sequential loop)."""
    import time

    from mmlrec_tpu.train.multi_seed import SeedSuiteTrainer
    from mmlrec_tpu.train.sweep import GridSweepTrainer

    cfg = ExperimentConfig.from_file(args.config)
    if args.run and args.model_name:
        cfg.model_config.model_name = args.model_name
    if args.device_eval:
        cfg.training_config.extra["device_eval"] = True
    mc, dc, oc, tc = (
        cfg.model_config, cfg.data_config, cfg.optim_config, cfg.training_config,
    )
    print(cfg.to_dict())

    ds = load_dataset(cfg, args)
    model = get_model(mc.model_name, ds.layout, cfg)
    if lrs:
        print(f"vmapped (seed x lr) grid: seeds={seeds} lrs={lrs}")
        suite = GridSweepTrainer(model, seeds=seeds, lrs=lrs).compile(
            optimizer=oc.optimizer, loss=oc.loss, metrics=oc.metrics
        )
    else:
        print(f"vmapped seed suite: {seeds}")
        suite = SeedSuiteTrainer(model, seeds=seeds).compile(
            optimizer=oc.optimizer, loss=oc.loss, metrics=oc.metrics
        )
    t0 = time.time()
    suite.fit(
        ds.train_input, ds.y_train,
        batch_size=tc.train_batch_size, epochs=tc.epochs,
        validation_data=(ds.test_input, ds.y_test),
    )
    wall = time.time() - t0
    if args.device_eval:
        per_combo = suite.masked_test_metrics_device(
            ds.test_input, ds.y_test, ds.test_mask, tc.test_batch_size
        )
    else:
        preds = suite.predict(ds.test_input, tc.test_batch_size)
        y_test = suite.tr._prepare_y(ds.y_test)
        per_combo = [
            masked_test_metrics(
                y_test, preds[si], mc.task_name, dc.num_domains, ds.test_mask,
                suite.tr.model.task_types,
            )
            for si in range(len(suite.row_labels))
        ]
    for si, label in enumerate(suite.row_labels):
        results = per_combo[si]
        row = {
            "type": f"{dc.data_name}_{mc.task_name}_{mc.model_name}_{label}",
            **results,
            "suite_wall_s": round(wall, 1),
        }
        print(row)
        append_result_row(dc.test_result_path, row)


if __name__ == "__main__":
    main()
