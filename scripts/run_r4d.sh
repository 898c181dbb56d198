#!/bin/bash
# Round-4d closing pass: the /tmp wipe killed the r4c quality chain at
# mcmc30k step 22500 (7k/15k vals persisted; checkpoint lost). This
# bounded script fits the remaining session: a default-strategy 7k run
# on the SAME synthetic scene (same make_synth_dataset seed/config) with
# frequent milestones, then the end-to-end compression A/B CSV
# (unsorted/serpentine/serpentine+plas) from its newest checkpoint —
# VERDICT r3 items 3 + 6. Every milestone persists into results/ as soon
# as it exists; an outer timeout guarantees the chip is idle again before
# the driver's bench run.
set -x
cd "$(dirname "$0")/.."
DATA=${DATA:-/tmp/q4_data}
OUT=${OUT:-/tmp/q4d}
RES=results/quality_r4
mkdir -p "$OUT" "$RES"

persist() {
  for f in "$OUT/default7k"/val_step*.json "$OUT/default7k"/stats.jsonl \
           "$OUT/default7k"/cfg.json; do
    [ -f "$f" ] || continue
    mkdir -p "$RES/default7k"
    cp "$f" "$RES/default7k/"
  done
  # compress_eval outputs go in their own subdir, and only the suffixed
  # files: compress_eval.py transiently writes a bare val_step{step}.json
  # before os.replace-ing it to val_step{step}_{variant}.json — a timeout
  # between the two would leave a bare file that must not clobber the
  # training run's persisted val_step{step}.json above.
  for f in "$OUT/default7k"/compress_eval/val_step*_*.json; do
    [ -f "$f" ] || continue
    mkdir -p "$RES/default7k/compress_eval"
    cp "$f" "$RES/default7k/compress_eval/"
  done
}

# Milestones persist as soon as they exist: a background watcher copies
# every ~60s so a mid-run kill or /tmp wipe (the failure mode this script
# exists to survive) loses at most a minute of evidence.
( while sleep 60; do persist; done ) &
PERSIST_PID=$!
trap 'kill "$PERSIST_PID" 2>/dev/null' EXIT

timeout "${TRAIN_TIMEOUT:-1980}" python examples/simple_trainer.py default \
  --data-dir "$DATA" --data-factor 1 --white-bkgd --test-every 8 \
  --max-steps 7000 --eval-steps 1000 2000 4000 7000 \
  --save-steps 2000 4000 7000 \
  --result-dir "$OUT/default7k" 2>&1 | tail -30
persist

CKPT=$(ls -v "$OUT"/default7k/ckpt_*.npz 2>/dev/null | tail -1)
if [ -n "$CKPT" ]; then
  timeout "${COMPRESS_TIMEOUT:-900}" python scripts/compress_eval.py \
    --ckpt "$CKPT" --data-dir "$DATA" \
    --out-csv "$RES/compression.csv" 2>&1 | tail -20
fi
persist
echo "=== r4d done ==="
for f in "$RES"/default7k/val_step*.json "$RES"/compression.csv; do
  [ -f "$f" ] && echo "$f: $(cat "$f" | head -c 400)"
done
