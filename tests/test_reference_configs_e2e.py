"""Train with the REAL reference config files (hyperparameters, regimes,
model choices) end-to-end on schema-shaped synthetic data.

This exercises model construction at the reference's true sizes — e.g. PLE
with num_levels=2 / specific=3 / shared=2 on movielens, SNR with 4 domains
on IAAC, STAR msl with 3 domains + BN on amazon_new, MSSM mtmsl — not just
the toy shapes of the unit tests."""

import copy
import os

import numpy as np
import pytest

from mmlrec_tpu.config import ExperimentConfig, unserialize
from mmlrec_tpu.data import CTRDataset, get_test_mask
from mmlrec_tpu.models import get_model
from mmlrec_tpu.synthetic import make_data
from mmlrec_tpu.train import Trainer
from mmlrec_tpu.train.metrics import masked_test_metrics

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

CONFIGS = [
    ("configs_mtl/config_census.json", None),       # mssm, 29 sparse + 11 dense
    ("configs_mtl/config_movielens.json", None),    # ple levels=2
    ("configs_msl/config_AE.json", None),           # sharedbottom msl D=2
    ("configs_msl/config_amazon.json", None),       # star msl D=3 + domain BN
    ("configs_msl/config_IAAC.json", None),         # snr_trans msl D=4
    ("configs_mtmsl/config_amazon.json", None),     # star mtmsl T=4 D=2
    ("configs_mtmsl/config_movielens.json", None),  # mssm mtmsl
    # apg/pepnet require a scene_feature -> only valid on msl/mtmsl configs
    # (the reference crashes identically on scene-less configs)
    ("configs_msl/config_movielens.json", "apg"),
    ("configs_msl/config_kuairec.json", "pepnet"),
    ("configs_mtl/config_census.json", "hmoe"),     # hmoe on census shapes
]


@pytest.mark.parametrize("rel_path,model_override", CONFIGS)
def test_reference_config_trains(rel_path, model_override, tmp_path):
    raw = unserialize(os.path.join(REF, rel_path))
    raw = copy.deepcopy(raw)
    raw["training_config"]["epochs"] = 1
    raw["training_config"]["train_batch_size"] = 256
    raw["training_config"]["test_batch_size"] = 256
    raw["data_config"]["test_result_path"] = ""
    # reference configs set save=true / save_path=./checkpoint — keep the
    # save path exercised but out of the repo tree
    raw.setdefault("save_config", {})["save_path"] = str(tmp_path / "ckpt")
    if model_override:
        raw["model_config"]["model_name"] = model_override
    cfg = ExperimentConfig.from_dict(raw)

    layout, x_tr, y_tr, _ = make_data(cfg, n=1024, vocab=30, seed=0)
    _, x_te, y_te, _ = make_data(cfg, n=512, vocab=30, seed=1)
    dc = cfg.data_config
    test_mask = None
    if cfg.model_config.task_name in ("msl", "mtmsl") and dc.mask_column:
        test_mask = get_test_mask(x_te[dc.mask_column], dc.mask_values,
                                  dc.num_domains)

    model = get_model(cfg.model_config.model_name, layout, cfg)
    trainer = Trainer(model, seed=0).compile()
    trainer.fit(x_tr, y_tr, batch_size=256, epochs=1,
                validation_data=(x_te, y_te), verbose=0)
    preds = trainer.predict(x_te, 256)
    assert np.isfinite(preds).all()

    y_te_full = trainer._prepare_y(y_te)
    results = masked_test_metrics(
        y_te_full, preds, cfg.model_config.task_name, dc.num_domains,
        test_mask, trainer.model.task_types,
    )
    for k, v in results.items():
        assert np.isfinite(v), (k, v)
