#!/bin/bash
# Round-4c on-device chain: finish the quality suite + measure the
# dispatch-overhead split. Run WITHOUT an outer deadline (the r4 quality
# wrapper's timeout killed mcmc30k at step ~22700); every stage persists
# its evidence into results/quality_r4/ as soon as it exists.
set -x
cd "$(dirname "$0")/.."
DATA=${DATA:-/tmp/q4_data}
OUT=${OUT:-/tmp/q4}
RES=results/quality_r4
LOGDIR=${LOGDIR:-/tmp/q4logs}
mkdir -p "$OUT" "$RES" "$LOGDIR"

stage() {
  name=$1; shift
  if [ -f "$LOGDIR/$name.ok" ]; then echo "skip $name" | tee -a "$LOGDIR/queue.log"; return; fi
  echo "$(date) === $name: $*" | tee -a "$LOGDIR/queue.log"
  if "$@" > "$LOGDIR/$name.log" 2>&1; then
    touch "$LOGDIR/$name.ok"
    echo "$(date) $name OK" | tee -a "$LOGDIR/queue.log"
  else
    rc=$?  # must be captured before any command substitution resets $?
    echo "$(date) $name FAILED (rc=$rc)" | tee -a "$LOGDIR/queue.log"
  fi
  tail -5 "$LOGDIR/$name.log" | tee -a "$LOGDIR/queue.log"
}

persist() {
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

common=(--data-dir "$DATA" --data-factor 1 --white-bkgd
        --test-every 8 --max-steps 30000
        --eval-steps 7000 15000 30000 --save-steps 7000 15000 30000)

# 1) overhead splits (short; HOST must be otherwise idle too — concurrent
# CPU load poisons tunnel-dispatch-sensitive timings: the same raster
# stage measured 291 ms alone and 1535 ms next to a pytest run)
stage overhead3  timeout 2700 python scripts/exp_overhead.py
stage scan_bench timeout 2700 python scripts/exp_scan_bench.py
# same-session A/B: official bench step with [N,3]-boundary vs SoA-rows
# boundary (decides whether bench/trainer should cross SoA rows)
stage bench_aos  timeout 2700 python bench.py
stage bench_soa  timeout 2700 env GSPLAT_BENCH_SOA=1 python bench.py

# 2) finish mcmc30k from its newest checkpoint
if [ ! -f "$OUT/mcmc30k/val_step30000.json" ]; then
  CKPT=$(ls -v "$OUT"/mcmc30k/ckpt_*.npz 2>/dev/null | tail -1)
  timeout 21600 python examples/simple_trainer.py mcmc "${common[@]}" \
      --cap-max 300000 --compression png \
      ${CKPT:+--resume "$CKPT"} \
      --result-dir "$OUT/mcmc30k" 2>&1 | tail -40
  persist
fi

# 3) compression A/B artifact from the newest mcmc checkpoint
CKPT=$(ls -v "$OUT"/mcmc30k/ckpt_*.npz 2>/dev/null | tail -1)
if [ -n "$CKPT" ] && [ ! -f "$RES/compression.csv" ]; then
  timeout 7200 python scripts/compress_eval.py \
    --ckpt "$CKPT" --data-dir "$DATA" \
    --out-csv "$RES/compression.csv" 2>&1 | tail -20
  persist
fi

# 4) remaining quality configs (each persists on completion; a deadline
# kill between runs loses nothing already measured)
for cfg in default30k absgrad30k; do
  if [ ! -f "$OUT/$cfg/val_step30000.json" ]; then
    extra=()
    [ "$cfg" = absgrad30k ] && extra=(--absgrad --grow-grad2d 0.0008)
    CKPT=$(ls -v "$OUT/$cfg"/ckpt_*.npz 2>/dev/null | tail -1)
    timeout 21600 python examples/simple_trainer.py default "${common[@]}" \
        "${extra[@]}" ${CKPT:+--resume "$CKPT"} \
        --result-dir "$OUT/$cfg" 2>&1 | tail -40
    persist
  fi
done

persist
echo "=== results ==="
for f in "$RES"/*/val_step*.json; do echo "$f: $(cat "$f")"; done
echo "$(date) R4C CHAIN DONE" | tee -a "$LOGDIR/queue.log"
