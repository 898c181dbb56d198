#!/bin/bash
# Multi-chip benchmark sweep — TPU analog of the reference
# examples/benchmarks/basic_4gpus.sh: data-parallel cameras over the device
# mesh, Gaussian-sharded projection + all-to-all exchange, packed transfer,
# and steps scaled down by the device count (N devices = N-x batch).
#
# On a multi-chip TPU slice this runs as-is on the real mesh. On a
# single-chip or CPU-only host, set MOCK_MESH=8 to validate the identical
# SPMD program on a forced 8-device CPU mesh (XLA host platform devices —
# same partitioning, same collectives, no ICI).
set -e
cd "$(dirname "$0")"
source ./_scenes.sh
RESULT_DIR="${RESULT_DIR:-/tmp/bench_results/multichip}"

if [ -n "${MOCK_MESH:-}" ]; then
  export XLA_FLAGS="--xla_force_host_platform_device_count=${MOCK_MESH} ${XLA_FLAGS:-}"
  export GSPLAT_FORCE_CPU=1
  NDEV="$MOCK_MESH"
else
  NDEV=$(python -c "import jax; print(jax.device_count())")
fi
SCALER=$(python -c "print(1.0 / $NDEV)")
echo "mesh: $NDEV devices, steps_scaler=$SCALER"

for SCENE in $SCENE_LIST; do
  echo "Running $SCENE"
  DATA=$(make_scene "$SCENE" | tail -1)

  # reference: 4 GPUs => 4x effective batch => --steps_scaler 0.25 --packed
  python ../simple_trainer.py default "${COMMON[@]}" \
    --distributed --packed --steps-scaler "$SCALER" \
    --eval-steps $EVAL_STEPS --save-steps $SAVE_STEPS \
    --data-dir "$DATA" --result-dir "$RESULT_DIR/$SCENE"
done

for SCENE in $SCENE_LIST; do
  echo "=== Eval Stats: $SCENE ==="
  for STATS in "$RESULT_DIR/$SCENE"/val_step*.json; do
    echo "$STATS"; cat "$STATS"; echo
  done
done
