#!/bin/bash
# Round-4 on-device queue (VERDICT r3 item 1): revalidate parity after the
# round-3 kernel changes, then A/B every gated perf feature (MXU sigma,
# KF/KB, 2DGS coef/ts32, ts48 probe) and refresh the stage profile.
# Quality runs are NOT auto-started — review these results, flip defaults,
# re-bench, THEN kick off scripts/run_quality_r3.sh.
LOGDIR=${LOGDIR:-/tmp/q4logs}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."

probe() { timeout 120 python -u -c "import jax; print(jax.devices(), flush=True)" >> "$LOGDIR/probe.log" 2>&1; }

echo "$(date) waiting for TPU..." | tee -a "$LOGDIR/queue.log"
until probe; do sleep 120; done
echo "$(date) TPU UP" | tee -a "$LOGDIR/queue.log"

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

stage parity3d        python scripts/check_binned_tpu.py parity
stage parity2d        python scripts/check_2dgs_binned_tpu.py parity
stage mxu_shapes      python scripts/exp_mxu_kernel_shapes.py --ts 32
stage bench3d_exact   python scripts/check_binned_tpu.py bench
stage bench3d_mxu     env GSPLAT_SIGMA_MXU=1 python scripts/check_binned_tpu.py parity bench
stage bench_official  python bench.py
stage bench_kf256     env GSPLAT_KF=256 python scripts/check_binned_tpu.py bench
stage bench_kf128     env GSPLAT_KF=128 python scripts/check_binned_tpu.py bench
stage ts32_2dgs       env TS=32 python scripts/check_2dgs_binned_tpu.py parity bench
stage coef2d          env GSPLAT_2DGS_COEF=1 python scripts/check_2dgs_binned_tpu.py parity bench
stage coef2d_ts32     env GSPLAT_2DGS_COEF=1 TS=32 python scripts/check_2dgs_binned_tpu.py parity bench
stage coef2d_ts32_pb  env GSPLAT_2DGS_COEF=1 TS=32 GSPLAT_PB=512 python scripts/check_2dgs_binned_tpu.py parity bench
# ts=48 exceeded VMEM with the exact sigma (23.5M scoped, PERF.md); the
# MXU-sigma variant drops enough [P,K] live arrays that it may now fit —
# a failed stage here is expected-possible and non-fatal
stage ts48_mxu        env GSPLAT_SIGMA_MXU=1 TS=48 python scripts/check_binned_tpu.py parity bench
stage ts48_mxu_kb64   env GSPLAT_SIGMA_MXU=1 TS=48 GSPLAT_KB=64 python scripts/check_binned_tpu.py bench
stage profile         python scripts/profile_binned.py

echo "$(date) QUEUE DONE" | tee -a "$LOGDIR/queue.log"
