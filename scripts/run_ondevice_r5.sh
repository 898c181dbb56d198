#!/bin/bash
# Round-5 on-device measurement chain (IDLE HOST REQUIRED — CLAUDE.md rule:
# never time the chip while anything else runs on the host).
# Parity for both binned kernels was already revalidated this round
# (PERF.md "Round-5 on-device results"); this chain is the timed half:
#   1. exp_bwd_sweep.py — (KF, KB, PB) sweep (VERDICT r4 item 2) with
#      scan-steady timing + on-device grad parity vs the default config.
#   2. profile_binned.py — refreshed cumulative-prefix stage split (the
#      3-pass selection matmuls changed emit + reduce).
#   3. bench.py — official metric + C=4 shared-vs-per-camera slab A/B.
set -x
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r5_ondevice}
mkdir -p "$OUT"

python scripts/exp_bwd_sweep.py 2>&1 | tee "$OUT/bwd_sweep.log"
python scripts/profile_binned.py 2>&1 | tee "$OUT/profile.log"
python bench.py 2>&1 | tee "$OUT/bench.log"
echo "=== ondevice r5 chain done ==="
