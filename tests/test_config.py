import glob
import os

import pytest

from mmlrec_tpu.config import ExperimentConfig

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize(
    "path",
    sorted(
        glob.glob(f"{REF}/configs_mtl/*.json")
        + glob.glob(f"{REF}/configs_msl/*.json")
        + glob.glob(f"{REF}/configs_mtmsl/*.json")
    ),
)
def test_parses_reference_configs_unchanged(path):
    cfg = ExperimentConfig.from_file(path)
    assert cfg.model_config.task_name in ("mtl", "msl", "mtmsl")
    assert cfg.num_tasks >= 2
    assert cfg.training_config.train_batch_size == 4096


def test_num_tasks_per_regime():
    base = {
        "data_config": {"label_columns": ["l", "l", "l2", "l2"], "num_domains": 2,
                        "mask_values": [0, 1], "mask_column": "c"},
        "model_config": {"task_name": "mtmsl", "task_names": ["a", "b"],
                         "task_types": ["binary"] * 4},
    }
    cfg = ExperimentConfig.from_dict(base)
    assert cfg.num_tasks == 4  # len(label_columns), reference basemodel.py:99-100
    assert cfg.target_columns == ["l", "l2"]

    base["model_config"]["task_name"] = "msl"
    base["model_config"]["task_types"] = ["binary", "binary"]
    assert ExperimentConfig.from_dict(base).num_tasks == 2  # num_domains

    base["model_config"]["task_name"] = "mtl"
    assert ExperimentConfig.from_dict(base).num_tasks == 2  # len(task_names)


def test_validation_rejects_bad_mask_values():
    raw = {
        "data_config": {"label_columns": ["l", "l"], "num_domains": 3,
                        "mask_values": [0, 1], "mask_column": "c"},
        "model_config": {"task_name": "msl", "task_types": ["binary"] * 3},
    }
    with pytest.raises(ValueError):
        ExperimentConfig.from_dict(raw)


def test_roundtrip_preserves_unknown_keys():
    raw = {"model_config": {"task_name": "mtl", "mystery_key": 7,
                            "task_types": ["binary", "binary"]}}
    cfg = ExperimentConfig.from_dict(raw)
    assert cfg.model_config.extra["mystery_key"] == 7
    assert cfg.to_dict()["model_config"]["mystery_key"] == 7


def test_shipped_config_suite_parses_and_runs():
    """configs/{mtl,msl,mtmsl}: all 12 mirrored reference configs parse,
    carry the TPU performance stanza, and one per regime runs a tiny
    synthetic fit end-to-end."""
    import glob
    import json
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs/*/config_*.json")))
    assert len(paths) == 12, paths
    per_regime = {}
    for p in paths:
        cfg = ExperimentConfig.from_dict(json.load(open(p)))
        if cfg.optim_config.optimizer == "adam":
            # two_phase implements SparseADAM; adagrad configs skip it
            assert cfg.model_config.extra.get("two_phase_embedding") is True, p
            assert cfg.model_config.extra.get("table_update") == "auto", p
        else:
            assert "two_phase_embedding" not in cfg.model_config.extra, p
        assert cfg.training_config.extra.get("device_eval") is True, p
        per_regime.setdefault(cfg.model_config.task_name, p)
    assert set(per_regime) == {"mtl", "msl", "mtmsl"}
    for regime, p in sorted(per_regime.items()):
        env = dict(os.environ, MMLREC_PLATFORM="cpu")
        code = (
            "import json, sys; raw = json.load(open(sys.argv[1])); "
            "raw['training_config']['epochs'] = 1; "
            "raw['data_config']['test_result_path'] = ''; "
            "raw['save_config']['save'] = False; "
            "json.dump(raw, open(sys.argv[2], 'w'))"
        )
        import tempfile
        tmp = tempfile.mktemp(suffix=".json")
        subprocess.run([_sys.executable, "-c", code, p, tmp], check=True)
        r = subprocess.run(
            [_sys.executable, "main.py", "--config", tmp, "--seed", "0",
             "--synthetic", "--synthetic_rows", "512"],
            cwd=repo, env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, (regime, r.stdout[-1500:], r.stderr[-3000:])
