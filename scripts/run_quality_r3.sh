#!/bin/bash
# Round-3 quality benchmark (VERDICT r2 item 7): scaled synthetic-garden
# runs on the real TPU with the binned train step. Writes results under
# /tmp/q3/<config>/ and prints a summary. ~hours of wall clock — run in
# background, tail the logs.
set -x
DATA=/tmp/q3_data
OUT=/tmp/q3
mkdir -p "$OUT"

# 64 cameras at 648x420: 2x the round-2 camera count and 2x resolution
[ -f "$DATA/sparse/0/points3D.bin" ] || \
  python scripts/make_synth_dataset.py --out "$DATA" --n-cams 64 \
    --width 648 --height 420 --n-points 60000

common=(--data-dir "$DATA" --data-factor 1 --white-bkgd
        --test-every 8 --max-steps 30000
        --eval-steps 7000 15000 30000 --save-steps 30000)

run() {
  name=$1; shift
  if [ -f "$OUT/$name/val_step30000.json" ]; then echo "skip $name"; return; fi
  timeout 28800 python examples/simple_trainer.py "$@" \
      --result-dir "$OUT/$name" 2>&1 | tail -40
}

run default30k default "${common[@]}"
run mcmc30k    mcmc    "${common[@]}" --cap-max 300000
run absgrad30k default "${common[@]}" --absgrad --grow-grad2d 0.0008

echo "=== results ==="
for f in "$OUT"/*/val_step*.json; do echo "$f: $(cat "$f")"; done
