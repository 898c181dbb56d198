#!/bin/bash
# Round-4 follow-on queue: runs after run_ondevice_r4.sh drains.
# The r4 queue probes ts=48 only with GSPLAT_SIGMA_MXU=1 (measured 4.5x
# SLOWER in-kernel, PERF.md round-4) — probe ts=48/64 with the EXACT sigma
# instead, shrinking VMEM via smaller KF/KB (fewer live slice temporaries).
LOGDIR=${LOGDIR:-/tmp/q4logs}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."

stage() {
  name=$1; shift
  if [ -f "$LOGDIR/$name.ok" ]; then echo "skip $name" | tee -a "$LOGDIR/queue.log"; return; fi
  echo "$(date) === $name: $*" | tee -a "$LOGDIR/queue.log"
  if timeout 2700 "$@" > "$LOGDIR/$name.log" 2>&1; then
    touch "$LOGDIR/$name.ok"
    echo "$(date) $name OK" | tee -a "$LOGDIR/queue.log"
  else
    rc=$?  # must be captured before any command substitution resets $?
    echo "$(date) $name FAILED (rc=$rc)" | tee -a "$LOGDIR/queue.log"
  fi
  tail -5 "$LOGDIR/$name.log" | tee -a "$LOGDIR/queue.log"
}

# decision-critical stages first
stage slice_skip      env GSPLAT_SLICE_SKIP=1 python scripts/check_binned_tpu.py parity bench
stage profile2        python scripts/profile_binned.py
stage bench2d_ts16    python scripts/check_2dgs_binned_tpu.py bench

# VMEM-fit probes: ts=48 exact sigma with shrinking K (a failed stage is
# expected-possible and non-fatal; parity first so a fit is trustworthy)
stage ts48_exact_kf128 env TS=48 GSPLAT_KF=128 GSPLAT_KB=128 python scripts/check_binned_tpu.py parity bench
stage ts48_exact_kf256 env TS=48 GSPLAT_KF=256 GSPLAT_KB=128 python scripts/check_binned_tpu.py bench
stage ts48_exact_kf256_kb256 env TS=48 GSPLAT_KF=256 GSPLAT_KB=256 python scripts/check_binned_tpu.py bench
stage ts64_exact_kf128 env TS=64 GSPLAT_KF=128 GSPLAT_KB=128 python scripts/check_binned_tpu.py bench

echo "$(date) R4B QUEUE DONE" | tee -a "$LOGDIR/queue.log"
