#!/bin/bash
# Round-4 session E: arm-isolated follow-ups after session D.
#  E0 linecache product A/B (v2 — the session-D attempt wedged the remote
#     compiler on the hotspot pad+roll arm; v2 isolates arms).
#  E1 jacobi f32+concat iso-point (split the bf16 1.22x win into its
#     roll->concat and storage components).
#  E2 hotspot bf16 re-measure with the passthrough-invariance fix.
#  E3 fp8 storage on-chip validation + marginal number.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=/tmp/session_e.log

stage() { echo "=== [$(date +%H:%M:%S)] $1" | tee -a "$LOG"; }

stage "E0: linecache product A/B (arm-isolated)"
python -u experiments/lc_product2.py 2>&1 | tee -a "$LOG" | tail -20

stage "E1: jacobi shift-lowering iso (f32 roll / f32 concat / bf16 concat)"
timeout 3600 python -u experiments/micro_bf16_iso.py e1 2>&1 \
  | tee -a "$LOG" | tail -4

stage "E2: hotspot bf16 re-measure (passthrough fix)"
timeout 3600 python -u experiments/micro_bf16_iso.py e2 2>&1 \
  | tee -a "$LOG" | tail -3

stage "E3: fp8 storage on-chip validation + jacobi marginal"
timeout 3600 python -u experiments/micro_fp8.py 2>&1 | tee -a "$LOG" | tail -4

stage "DONE"
