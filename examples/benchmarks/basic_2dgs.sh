#!/bin/bash
# 2DGS benchmark sweep — TPU analog of the reference
# examples/benchmarks/basic_2dgs.sh (surfel model, normal/distortion
# regularizers on by the 2DGS trainer's defaults).
set -e
cd "$(dirname "$0")"
source ./_scenes.sh
RESULT_DIR="${RESULT_DIR:-/tmp/bench_results/2dgs}"

for SCENE in $SCENE_LIST; do
  echo "Running $SCENE"
  DATA=$(make_scene "$SCENE" | tail -1)

  python ../simple_trainer_2dgs.py default "${COMMON[@]}" \
    --eval-steps $EVAL_STEPS --save-steps $SAVE_STEPS \
    --data-dir "$DATA" --result-dir "$RESULT_DIR/$SCENE"
done

for SCENE in $SCENE_LIST; do
  echo "=== Eval Stats: $SCENE ==="
  for STATS in "$RESULT_DIR/$SCENE"/val_step*.json; do
    echo "$STATS"; cat "$STATS"; echo
  done
done

python ./summarize_stats.py --results-dir "$RESULT_DIR" \
  --scenes $SCENE_LIST --stage val
