#!/bin/bash
# Round-5 session F: harvest the round-4 session-E queue (VERDICT r4 #2).
# Reordered most-decision-critical-first:
#   F1 hotspot bf16 A/B (post passthrough-fix — the committed 0.825x is
#      pre-fix and invalid; the two f32-arm compiles are already cached)
#   F2 fdtd bf16 A/B (the one bandwidth-bound row, memory_time_fraction
#      0.94 — VERDICT r4 #3)
#   F3/F4 strip-height sweeps 224/320/448 at p16 (VERDICT r4 #5)
#   F5/F6 line-cache product A/Bs -> adopt-or-retire (VERDICT r4 #4)
#   F7 fp8 storage probe (VERDICT r4 #7, stretch)
# Strictly sequential — one chip, one process at a time.
#
# Compile cache lives IN THE REPO (gitignored): /root/.cache is wiped
# between rounds (observed: recreated 02:18 round-5 start), which is why
# the round-4 driver bench paid cold compiles. A repo-local cache survives
# anything that preserves the workspace.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
LOG=${LOG:-/tmp/session_f.log}

stage() {
  echo "=== [$(date +%H:%M:%S)] $1" | tee -a "$LOG"
}

stage "F1: bf16 storage A/B hotspot 8192^2 (post passthrough-invariance fix)"
timeout 3600 python -u experiments/micro_bf16.py hotspot 8192 2>&1 \
  | tee -a "$LOG" | tail -4

stage "F2: bf16 storage A/B fdtd 1024^2 (bandwidth-bound row)"
timeout 3600 python -u experiments/micro_bf16.py fdtd 2>&1 \
  | tee -a "$LOG" | tail -4

stage "F3: strip-height sweep jacobi-bf16 (224/320/448, p16)"
timeout 5400 python -u experiments/strip_sweep.py jacobi_bf16 2>&1 \
  | tee -a "$LOG" | tail -10

stage "F4: strip-height sweep hotspot f32 (224/320/448, p16)"
timeout 5400 python -u experiments/strip_sweep.py hotspot 2>&1 \
  | tee -a "$LOG" | tail -10

stage "F5: linecache product A/B hotspot 8192^2 (5 arms)"
timeout 7200 python -u experiments/lc_product.py hotspot 2>&1 \
  | tee -a "$LOG" | tail -12

stage "F6: linecache product A/B fdtd 1024^2 (3 arms)"
timeout 5400 python -u experiments/lc_product.py fdtd 2>&1 \
  | tee -a "$LOG" | tail -8

stage "DONE"
