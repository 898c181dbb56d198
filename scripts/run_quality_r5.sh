#!/bin/bash
# Round-5 quality matrix (VERDICT r4 item 5): the two runs still missing
# from the evidence table — default-strategy 7k (the reference's flagship
# row, EXPLORATION.md:8) and mcmc 30k — on the SAME synthetic garden scene
# and reference hyperparams as rounds 3/4, with the round-5 trainer's
# projected pool pre-sizing (recompiles bounded to ~1 per run).
#
# Evidence persists into results/quality_r5/ continuously (60s background
# watcher — a mid-run kill or /tmp wipe loses at most a minute). Training
# logs are kept too: the [pool]/[isect] lines are the recompile-count
# evidence for the "<=1 mid-run recompile" claim.
#
# IDLE-HOST RULE (CLAUDE.md): nothing else may run beside this script —
# tunnel dispatch is host-CPU-sensitive and contaminates steps/s.
set -x
cd "$(dirname "$0")/.."
DATA=${DATA:-/tmp/q5_data}
OUT=${OUT:-/tmp/q5}
RES=results/quality_r5
mkdir -p "$OUT" "$RES"

persist() {
  for run in default7k mcmc30k; do
    for f in "$OUT/$run"/val_step*.json "$OUT/$run"/stats.jsonl \
             "$OUT/$run"/cfg.json "$OUT/$run"/train.log; do
      [ -f "$f" ] || continue
      mkdir -p "$RES/$run"
      cp "$f" "$RES/$run/"
    done
    # only suffixed compress_eval artifacts, in their own subdir (a timeout
    # between eval() and os.replace leaves a bare val_step file that must
    # not clobber the training evidence)
    for f in "$OUT/$run"/compress_eval/val_step*_*.json; do
      [ -f "$f" ] || continue
      mkdir -p "$RES/$run/compress_eval"
      cp "$f" "$RES/$run/compress_eval/"
    done
  done
}
( while sleep 60; do persist; done ) &
PERSIST_PID=$!
trap 'kill "$PERSIST_PID" 2>/dev/null' EXIT

[ -f "$DATA/sparse/0/cameras.bin" ] || python scripts/make_synth_dataset.py \
  --out "$DATA" --n-cams 64 --width 648 --height 420 --n-points 60000

# 1) default-strategy 7k — the reference's flagship table row
mkdir -p "$OUT/default7k"
timeout "${DEFAULT_TIMEOUT:-4200}" python examples/simple_trainer.py default \
  --data-dir "$DATA" --data-factor 1 --white-bkgd --test-every 8 \
  --max-steps 7000 --eval-steps 1000 2000 4000 7000 \
  --save-steps 4000 7000 \
  --result-dir "$OUT/default7k" > "$OUT/default7k/train.log" 2>&1
tail -5 "$OUT/default7k/train.log"
persist

# 2) mcmc 30k with compression (the r4 run that was lost at step 22700)
mkdir -p "$OUT/mcmc30k"
timeout "${MCMC_TIMEOUT:-12000}" python examples/simple_trainer.py mcmc \
  --data-dir "$DATA" --data-factor 1 --white-bkgd --test-every 8 \
  --cap-max 300000 --max-steps 30000 \
  --eval-steps 7000 15000 30000 --save-steps 15000 30000 \
  --compression png \
  --result-dir "$OUT/mcmc30k" > "$OUT/mcmc30k/train.log" 2>&1
tail -5 "$OUT/mcmc30k/train.log"
persist

# 3) end-to-end compression A/B from the newest checkpoint of either run
CKPT=$(ls -v "$OUT"/mcmc30k/ckpt_*.npz "$OUT"/default7k/ckpt_*.npz 2>/dev/null | tail -1)
if [ -n "$CKPT" ]; then
  timeout "${COMPRESS_TIMEOUT:-1200}" python scripts/compress_eval.py \
    --ckpt "$CKPT" --data-dir "$DATA" \
    --out-csv "$RES/compression.csv" 2>&1 | tail -10
fi
persist
echo "=== quality r5 done ==="
grep -h "\[pool\]\|\[isect\]" "$OUT"/*/train.log | sort | uniq -c
for f in "$RES"/*/val_step*.json "$RES"/compression.csv; do
  [ -f "$f" ] && echo "$f: $(head -c 300 "$f")"
done
