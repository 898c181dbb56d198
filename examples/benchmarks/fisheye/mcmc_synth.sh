#!/bin/bash
# Fisheye benchmark — TPU analog of the reference
# examples/benchmarks/fisheye/mcmc_zipnerf.sh: MCMC training directly on
# distorted fisheye captures with --camera-model fisheye (no undistortion;
# the loader's theta-polynomial remap supplies the per-pixel validity mask,
# the projection kernel handles the equidistant model).
#
# The zipnerf scenes need network access; here each scene is a synthetic
# OPENCV_FISHEYE COLMAP capture from make_synth_dataset --fisheye.
#
#   CAP_MAX=500000 bash examples/benchmarks/fisheye/mcmc_synth.sh
#   BENCH_PRESET=smoke CAP_MAX=20000 bash examples/benchmarks/fisheye/mcmc_synth.sh
set -e
cd "$(dirname "$0")"
source ../_scenes.sh
CAP_MAX="${CAP_MAX:-500000}"
SCENE_LIST="${FISHEYE_SCENES:-berlin london}"
RESULT_DIR="${RESULT_DIR:-/tmp/bench_results/mcmc_${CAP_MAX}_fisheye}"

for SCENE in $SCENE_LIST; do
  echo "Running $SCENE"
  DATA=$(make_scene "$SCENE" --fisheye | tail -1)

  # reference adds --opacity_reg 0.001 --use_bilateral_grid for zipnerf
  python ../../simple_trainer.py mcmc "${COMMON[@]}" \
    --cap-max "$CAP_MAX" \
    --opacity-reg 0.001 \
    --use-bilateral-grid \
    --camera-model fisheye \
    --eval-steps $EVAL_STEPS --save-steps $SAVE_STEPS \
    --data-dir "$DATA" --result-dir "$RESULT_DIR/$SCENE"
done

for SCENE in $SCENE_LIST; do
  echo "=== Eval Stats: $SCENE ==="
  for STATS in "$RESULT_DIR/$SCENE"/val_step*.json; do
    echo "$STATS"; cat "$STATS"; echo
  done
done
