#!/bin/bash
# PNG-compression benchmark — TPU analog of the reference
# examples/benchmarks/compression/mcmc.sh: MCMC runs bounded at CAP_MAX,
# then PNG-compress the final splats and round-trip eval. The trainer's
# --compression png hook writes compression_<step>/report.json with
# {size_bytes, psnr, ssim, ...}; summarize_stats.py averages across scenes.
#
#   CAP_MAX=1000000 bash examples/benchmarks/compression/mcmc.sh
#   BENCH_PRESET=smoke CAP_MAX=20000 bash examples/benchmarks/compression/mcmc.sh
set -e
cd "$(dirname "$0")"
source ../_scenes.sh
CAP_MAX="${CAP_MAX:-1000000}"
RESULT_DIR="${RESULT_DIR:-/tmp/bench_results/mcmc_${CAP_MAX}_png_compression}"

for SCENE in $SCENE_LIST; do
  echo "Running $SCENE"
  DATA=$(make_scene "$SCENE" | tail -1)

  python ../../simple_trainer.py mcmc "${COMMON[@]}" \
    --cap-max "$CAP_MAX" \
    --eval-steps $EVAL_STEPS --save-steps $SAVE_STEPS \
    --compression png \
    --data-dir "$DATA" --result-dir "$RESULT_DIR/$SCENE"
done

python ../summarize_stats.py --results-dir "$RESULT_DIR" \
  --scenes $SCENE_LIST --stage compress
