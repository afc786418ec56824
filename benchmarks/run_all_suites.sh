#!/bin/bash
# Run every reference config suite end-to-end in synthetic mode (1 seed).
# Produces reference-schema result CSVs under results/.
set -u
cd "$(dirname "$0")/.."
REF=${REF:-/root/reference}
mkdir -p results
for cfg in "$REF"/configs_mtl/*.json "$REF"/configs_msl/*.json "$REF"/configs_mtmsl/*.json; do
  name=$(basename "$cfg" .json)_$(basename $(dirname "$cfg"))
  echo "=== $name"
  python - "$cfg" "results/${name}.json" <<'PY'
import json, sys
raw = json.load(open(sys.argv[1]))
raw["training_config"]["epochs"] = 2
raw["data_config"]["test_result_path"] = sys.argv[2].replace(".json", ".csv")
raw["save_config"]["save"] = False
raw["save_config"]["save_layer_output"] = False
json.dump(raw, open(sys.argv[2], "w"))
PY
  timeout 600 python main.py --config "results/${name}.json" --seed 0 --synthetic --synthetic_rows 8000 2>&1 | tail -1
done
echo "=== results:"
ls results/*.csv
