#!/bin/bash
# Run the full 12-config suite (configs/{mtl,msl,mtmsl}) end-to-end.
# With real datasets under data/ this reproduces the reference benchmark
# protocol; without them, SYNTHETIC=1 (default) trains on generated data
# with each config's schema.  Produces reference-schema result CSVs under
# results/.
#
#   ./benchmarks/run_all_suites.sh                  # synthetic, 1 seed, 2 epochs
#   SYNTHETIC=0 SEEDS=0,2,4,8 EPOCHS= ./benchmarks/run_all_suites.sh  # real protocol
set -u
cd "$(dirname "$0")/.."
SYNTHETIC=${SYNTHETIC:-1}
SEEDS=${SEEDS:-0}
EPOCHS=${EPOCHS:-2}       # empty = keep each config's protocol epochs
ROWS=${ROWS:-8000}
mkdir -p results
for cfg in configs/mtl/*.json configs/msl/*.json configs/mtmsl/*.json; do
  name=$(basename "$cfg" .json)_$(basename $(dirname "$cfg"))
  echo "=== $name"
  python - "$cfg" "results/${name}.json" "$EPOCHS" <<'PY'
import json, sys
raw = json.load(open(sys.argv[1]))
if sys.argv[3]:
    raw["training_config"]["epochs"] = int(sys.argv[3])
raw["data_config"]["test_result_path"] = sys.argv[2].replace(".json", ".csv")
raw["save_config"]["save"] = False
raw["save_config"]["save_layer_output"] = False
json.dump(raw, open(sys.argv[2], "w"))
PY
  extra=""
  if [ "$SYNTHETIC" = "1" ]; then extra="--synthetic --synthetic_rows $ROWS"; fi
  # Wide configs (kuairec-msl: 33 features, 512/256 nets) compile in 5-390 s
  # PER PROGRAM through the relay depending on the window (CLAUDE.md);
  # retry once so a slow window doesn't sink the run.
  for attempt in 1 2; do
    timeout 1500 python main.py --config "results/${name}.json" \
        --seeds "$SEEDS" $extra > "results/${name}.log" 2>&1
    rc=$?
    tail -1 "results/${name}.log"
    [ $rc -eq 0 ] && break
    echo "--- $name attempt $attempt exit $rc; retrying"
  done
done
echo "=== results:"
ls results/*.csv
