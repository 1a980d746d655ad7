#!/bin/bash
# Round-4 session D: the remaining close-out measurements, strictly
# sequential (one chip, one process at a time). Logs to /tmp/session_d.log.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=/tmp/session_d.log

stage() {
  echo "=== [$(date +%H:%M:%S)] $1" | tee -a "$LOG"
}

stage "D1: bf16 storage A/B jacobi+hotspot 8192^2"
timeout 3600 python -u experiments/micro_bf16.py both 8192 2>&1 \
  | tee -a "$LOG" | tail -5

stage "D2: linecache product A/B hotspot 8192^2 + fdtd 1024^2"
timeout 9000 python -u experiments/lc_product.py both 2>&1 \
  | tee -a "$LOG" | tail -8

stage "D3: monotile capacity anchors"
timeout 3600 python -u experiments/capacity_anchors.py 2>&1 \
  | tee -a "$LOG" | tail -4

stage "D4: full bench recording (straight-convection default)"
timeout 5400 python -u bench.py 2>&1 | tee -a "$LOG" | tail -20

stage "D5: on-chip hardware suite"
STENCILSTREAM_TEST_TPU=1 timeout 3600 python -m pytest \
  tests/test_tpu_hardware.py -q --no-header -p no:cacheprovider 2>&1 \
  | tee -a "$LOG" | tail -4

stage "D6: throughput curves recording"
timeout 10800 bash experiments/record_curves.sh 2>&1 | tee -a "$LOG" | tail -30

stage "DONE"
