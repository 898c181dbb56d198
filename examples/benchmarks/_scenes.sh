# Shared scene setup for the benchmark suite.
#
# The reference suite (reference examples/benchmarks/basic.sh:1-12) sweeps
# the seven MipNeRF-360 capture scenes. This image has zero egress, so the
# TPU suite sweeps procedurally generated COLMAP scenes instead: each
# "scene" is a distinct seed of scripts/make_synth_dataset.py (different
# point cloud, colors, and camera ring). Same mechanics — real COLMAP
# binary model on disk, train/val split by --test-every — different pixels.
#
# Scene geometry scales with $BENCH_PRESET:
#   full  — 64 cams, 648x420, 60k points (hours/scene on the v5e)
#   smoke — 8 cams, 200x160, 4k points (minutes/scene; CI-sized)
set -u
BENCH_PRESET="${BENCH_PRESET:-full}"
SCENE_DIR="${SCENE_DIR:-/tmp/bench_scenes}"
SCENE_LIST="${SCENE_LIST:-garden bicycle stump bonsai counter kitchen room}"

# seed per scene name (stable across runs so datasets cache on disk)
scene_seed() {
  case "$1" in
    garden) echo 3 ;; bicycle) echo 11 ;; stump) echo 23 ;;
    bonsai) echo 31 ;; counter) echo 47 ;; kitchen) echo 59 ;;
    room) echo 71 ;; treehill) echo 83 ;; flowers) echo 97 ;;
    *) echo $(( $(printf '%s' "$1" | cksum | cut -d' ' -f1) % 1000 )) ;;
  esac
}

if [ "$BENCH_PRESET" = "smoke" ]; then
  GEN_ARGS=(--n-cams 8 --width 200 --height 160 --n-points 4000
            --gt-splats 20000)
  MAX_STEPS=${MAX_STEPS:-300}
  EVAL_STEPS=${EVAL_STEPS:-"300"}
  SAVE_STEPS=${SAVE_STEPS:-"300"}
else
  GEN_ARGS=(--n-cams 64 --width 648 --height 420 --n-points 60000)
  MAX_STEPS=${MAX_STEPS:-30000}
  EVAL_STEPS=${EVAL_STEPS:-"7000 30000"}
  SAVE_STEPS=${SAVE_STEPS:-"30000"}
fi

# make_scene <name> [extra make_synth_dataset args...]
make_scene() {
  local name=$1; shift
  local dir="$SCENE_DIR/$name"
  if [ ! -f "$dir/sparse/0/points3D.bin" ]; then
    python "$(dirname "${BASH_SOURCE[0]}")/../../scripts/make_synth_dataset.py" \
      --out "$dir" --seed "$(scene_seed "$name")" "${GEN_ARGS[@]}" "$@"
  fi
  echo "$dir"
}

# Synthetic GT composites over white; every run needs these.
COMMON=(--data-factor 1 --white-bkgd --test-every 8
        --max-steps "$MAX_STEPS")
