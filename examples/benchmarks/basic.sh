#!/bin/bash
# Default-strategy benchmark sweep — TPU analog of the reference suite
# (reference examples/benchmarks/basic.sh): train each scene without eval,
# then re-invoke eval+render from every saved checkpoint, then dump stats.
#
#   BENCH_PRESET=smoke bash examples/benchmarks/basic.sh   # minutes
#   bash examples/benchmarks/basic.sh                      # full, hours
set -e
cd "$(dirname "$0")"
source ./_scenes.sh
RESULT_DIR="${RESULT_DIR:-/tmp/bench_results/basic}"
RENDER_TRAJ_PATH="${RENDER_TRAJ_PATH:-ellipse}"

for SCENE in $SCENE_LIST; do
  echo "Running $SCENE"
  DATA=$(make_scene "$SCENE" | tail -1)

  # train without eval (reference: --eval_steps -1)
  python ../simple_trainer.py default "${COMMON[@]}" \
    --eval-steps -1 --save-steps $SAVE_STEPS \
    --render-traj --render-traj-path "$RENDER_TRAJ_PATH" \
    --data-dir "$DATA" --result-dir "$RESULT_DIR/$SCENE"

  # eval + render from each checkpoint (reference: --ckpt loop; here the
  # trainer's eval-only resume mode: resume step >= max_steps)
  for CKPT in "$RESULT_DIR/$SCENE"/ckpt_*.npz; do
    python ../simple_trainer.py default "${COMMON[@]}" \
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
  echo "=== Train Stats: $SCENE ==="
  tail -1 "$RESULT_DIR/$SCENE/stats.jsonl"
done

python ./summarize_stats.py --results-dir "$RESULT_DIR" \
  --scenes $SCENE_LIST --stage val
