#!/bin/bash
# MCMC-strategy benchmark sweep — TPU analog of the reference
# examples/benchmarks/mcmc.sh (cap-max-bounded MCMC densification).
#
#   CAP_MAX=1000000 bash examples/benchmarks/mcmc.sh
#   BENCH_PRESET=smoke CAP_MAX=20000 bash examples/benchmarks/mcmc.sh
set -e
cd "$(dirname "$0")"
source ./_scenes.sh
CAP_MAX="${CAP_MAX:-1000000}"
RESULT_DIR="${RESULT_DIR:-/tmp/bench_results/mcmc_$CAP_MAX}"
RENDER_TRAJ_PATH="${RENDER_TRAJ_PATH:-ellipse}"

for SCENE in $SCENE_LIST; do
  echo "Running $SCENE"
  DATA=$(make_scene "$SCENE" | tail -1)

  python ../simple_trainer.py mcmc "${COMMON[@]}" \
    --cap-max "$CAP_MAX" \
    --eval-steps -1 --save-steps $SAVE_STEPS \
    --render-traj --render-traj-path "$RENDER_TRAJ_PATH" \
    --data-dir "$DATA" --result-dir "$RESULT_DIR/$SCENE"

  for CKPT in "$RESULT_DIR/$SCENE"/ckpt_*.npz; do
    python ../simple_trainer.py mcmc "${COMMON[@]}" \
      --cap-max "$CAP_MAX" \
      --render-traj --render-traj-path "$RENDER_TRAJ_PATH" \
      --data-dir "$DATA" --result-dir "$RESULT_DIR/$SCENE" \
      --resume "$CKPT"
  done
done

for SCENE in $SCENE_LIST; do
  echo "=== Eval Stats: $SCENE ==="
  for STATS in "$RESULT_DIR/$SCENE"/val_step*.json; do
    echo "$STATS"; cat "$STATS"; echo
  done
done

python ./summarize_stats.py --results-dir "$RESULT_DIR" \
  --scenes $SCENE_LIST --stage val
