#!/bin/bash
# Round-4 quality benchmark (VERDICT r3 items 3+6): 30k synthetic-garden
# runs on the real TPU with the binned train step, results PERSISTED INTO
# THE REPO under results/quality_r4/ (round-3's results died in /tmp).
# ~hours of wall clock — run in background after the A/B queue finishes.
set -x
cd "$(dirname "$0")/.."
DATA=${DATA:-/tmp/q4_data}
OUT=${OUT:-/tmp/q4}
RES=results/quality_r4
mkdir -p "$OUT" "$RES"

[ -f "$DATA/sparse/0/points3D.bin" ] || \
  python scripts/make_synth_dataset.py --out "$DATA" --n-cams 64 \
    --width 648 --height 420 --n-points 60000

common=(--data-dir "$DATA" --data-factor 1 --white-bkgd
        --test-every 8 --max-steps 30000
        --eval-steps 7000 15000 30000 --save-steps 7000 15000 30000)

persist() {
  # copy evidence into the repo after EVERY run so a deadline kill of the
  # suite (chain wrapper) never loses completed milestones
  for name in default30k mcmc30k absgrad30k; do
    for f in "$OUT/$name"/val_step*.json "$OUT/$name"/stats.jsonl \
             "$OUT/$name"/compression_*/report.json \
             "$OUT/$name"/compress_eval/val_step*.json; do
      [ -f "$f" ] || continue
      rel=${f#"$OUT/"}
      mkdir -p "$RES/$(dirname "$rel")"
      cp "$f" "$RES/$rel"
    done
  done
}

run() {
  name=$1; shift
  if [ -f "$OUT/$name/val_step30000.json" ]; then echo "skip $name"; return; fi
  timeout 28800 python examples/simple_trainer.py "$@" \
      --result-dir "$OUT/$name" 2>&1 | tail -40
  persist
}

# mcmc first: its checkpoint feeds the compression artifact below
run mcmc30k    mcmc    "${common[@]}" --cap-max 300000 --compression png
run default30k default "${common[@]}"
run absgrad30k default "${common[@]}" --absgrad --grow-grad2d 0.0008

# compression A/B from the mcmc checkpoint: serpentine vs +plas_refine
# (end-to-end {#GS, PSNR-after-decompress, bytes} — the artifact the
# reference publishes in examples/benchmarks/compression/results/*.csv)
CKPT=$(ls -v "$OUT"/mcmc30k/ckpt_*.npz 2>/dev/null | tail -1)
if [ -n "$CKPT" ] && [ ! -f "$RES/compression.csv" ]; then
  timeout 7200 python scripts/compress_eval.py \
    --ckpt "$CKPT" --data-dir "$DATA" \
    --out-csv "$RES/compression.csv" 2>&1 | tail -20
fi

persist

echo "=== results ==="
for f in "$RES"/*/val_step*.json; do echo "$f: $(cat "$f")"; done
