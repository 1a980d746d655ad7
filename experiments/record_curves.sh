#!/bin/bash
# Record throughput-vs-grid-size curves (the reference's headline figure,
# /root/reference/README.md:76) as metrics.*.json artifacts in docs/metrics,
# then render docs/throughput_curves.md. Run on the real TPU chip.
#
# Per-size n-iterations keep walltime >= ~1 s so the tunneled runtime's fixed
# per-call dispatch cost stays a small fraction.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
OUT=docs/metrics
mkdir -p "$OUT"

run() {
  echo "== $*" >&2
  timeout 2400 python -m stencilstream_tpu.bench max_perf "$@" --out-dir "$OUT" \
    2>&1 | grep -v -i warning
}

# hotspot + jacobi: tiling across sizes (tuned strips), monotile where resident
for size in 1024 2048 4096 8192; do
  case $size in
    1024) n=65536;; 2048) n=16384;; 4096) n=8192;; 8192) n=4096;;
  esac
  run hotspot --backend tiling --size $size --n-iterations $n \
      --strip-rows 112 --iters-per-pass 8 --unroll 8
  run jacobi --variant jacobi5_general --backend tiling --size $size --n-iterations $n --strip-rows 112 --iters-per-pass 8 --unroll 8 --shift-impl roll
done
for size in 1024 2048; do
  case $size in 1024) n=131072;; 2048) n=65536;; esac
  run hotspot --backend monotile --size $size --n-iterations $n --unroll 8
  run jacobi --variant jacobi5_general --backend monotile --size $size --n-iterations $n
done

# fdtd + convection: tiling at growing scales (the case builders derive the
# grid from --size)
for size in 512 1024 2048; do
  case $size in 512) n=131072;; 1024) n=65536;; 2048) n=16384;; esac
  run fdtd --backend tiling --size $size --n-iterations $n \
      --strip-rows 96 --iters-per-pass 8 --unroll 8
done
for size in 768 1536 3072; do
  case $size in 768) n=32768;; 1536) n=16384;; 3072) n=8192;; esac
  run convection --backend tiling --size $size --n-iterations $n \
      --strip-rows 128 --iters-per-pass 4 --unroll 4
done

python -m stencilstream_tpu.bench.curves "$OUT" -o docs/throughput_curves.md
