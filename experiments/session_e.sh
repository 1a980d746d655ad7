#!/bin/bash
# Round-4 session E: (1) re-measure bf16 storage for hotspot AFTER the
# passthrough-invariance fix (session D stage D1 measured the PRE-fix
# kernel, which re-wrote the invariant power plane every sub-step);
# (2) bf16 A/B for the bandwidth-bound fdtd tiling row (memory_time_
# fraction 0.94 in BENCH_DETAILS round 4); (3) rerun the line-cache
# product A/B that died in the remote-compile tunnel during session D
# (now arm-isolated with faulthandler + progress prints).
# Strictly sequential — one chip, one process at a time.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=/tmp/session_e.log

stage() {
  echo "=== [$(date +%H:%M:%S)] $1" | tee -a "$LOG"
}

stage "E1: bf16 storage A/B hotspot 8192^2 (post passthrough-invariance fix)"
timeout 3600 python -u experiments/micro_bf16.py hotspot 8192 2>&1 \
  | tee -a "$LOG" | tail -4

stage "E2: bf16 storage A/B fdtd 1024^2 (bandwidth-bound row)"
timeout 3600 python -u experiments/micro_bf16.py fdtd 2>&1 \
  | tee -a "$LOG" | tail -4

stage "E3: linecache product A/B hotspot 8192^2 (5 arms)"
timeout 10800 python -u experiments/lc_product.py hotspot 2>&1 \
  | tee -a "$LOG" | tail -12

stage "E4: linecache product A/B fdtd 1024^2"
timeout 7200 python -u experiments/lc_product.py fdtd 2>&1 \
  | tee -a "$LOG" | tail -8

stage "E5: strip-height sweep jacobi-bf16 (224/320/448, p16)"
timeout 7200 python -u experiments/strip_sweep.py jacobi_bf16 2>&1 \
  | tee -a "$LOG" | tail -8

stage "E6: strip-height sweep hotspot f32 (224/320/448, p16)"
timeout 7200 python -u experiments/strip_sweep.py hotspot 2>&1 \
  | tee -a "$LOG" | tail -8

stage "DONE"
