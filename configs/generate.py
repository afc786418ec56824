"""Regenerate configs/{mtl,msl,mtmsl}/ from the reference's config suites.

The 12 reference JSONs (reference configs_mtl/, configs_msl/,
configs_mtmsl/) are the framework's compatibility contract (SURVEY §5
"Config / flag system") — this script mirrors them here as ready-to-run
files, with only these edits:

  * dataset paths made relative (``data/<file>.csv`` — download per the
    reference README's dataset links, or run with ``--synthetic``);
  * result/output paths pointed at ``results/``;
  * the TPU performance stanza added (measured in docs/perf_notes.md):
    ``two_phase_embedding`` (row-sparse SparseAdam — required at
    production vocabularies), ``table_update: "auto"`` (Pallas write-only
    row kernel on TPU at >= 256 MB tables), and ``device_eval``
    (on-device exact AUC/acc/mse, scalars-only readback).

Run: python configs/generate.py [/path/to/reference]
"""

from __future__ import annotations

import json
import os
import sys

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))


def rewrite(raw: dict) -> dict:
    dc = raw["data_config"]
    for key in ("train_dataset_path", "test_dataset_path"):
        if dc.get(key):
            dc[key] = os.path.join("data", os.path.basename(dc[key]))
    for key in ("test_result_path", "layer_output_path"):
        if dc.get(key):
            dc[key] = os.path.join("results", os.path.basename(dc[key].rstrip("/")))
    # two_phase implements SparseADAM semantics (train/sparse_embedding.py)
    # — only set it where the reference config optimizes with adam
    # (everything except mtmsl/amazon's adagrad)
    if raw.get("optim_config", {}).get("optimizer", "adam") == "adam":
        raw["model_config"].update(
            {
                "two_phase_embedding": True,
                "table_update": "auto",
            }
        )
    raw.setdefault("training_config", {})["device_eval"] = True
    return raw


def main() -> None:
    n = 0
    for suite in ("mtl", "msl", "mtmsl"):
        src_dir = os.path.join(REF, f"configs_{suite}")
        dst_dir = os.path.join(HERE, suite)
        os.makedirs(dst_dir, exist_ok=True)
        for name in sorted(os.listdir(src_dir)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(src_dir, name)) as f:
                raw = json.load(f)
            with open(os.path.join(dst_dir, name), "w") as f:
                json.dump(rewrite(raw), f, indent=2)
                f.write("\n")
            n += 1
    print(f"wrote {n} configs")


if __name__ == "__main__":
    main()
