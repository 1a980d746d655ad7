#!/bin/bash
# Record throughput-vs-grid-size curves (the reference's headline figure,
# /root/reference/README.md:76) as metrics.*.json artifacts in docs/metrics,
# then render docs/throughput_curves.md. Run on the real TPU chip.
#
# One session records EVERY point (compile-cached points are cheap) so the
# table never mixes chip sessions; per-size n-iterations keep walltime
# >= ~1 s so the tunneled runtime's fixed per-call dispatch cost stays a
# small fraction. Series bounds that VMEM geometry forbids (hotspot
# monotile > 1536^2, jacobi monotile > 2048^2 at the 96 MiB residency
# budget; fdtd monotile > 1024^2 even with the invariant-plane elision) are
# genuine, not unrecorded — bench.curves renders them as n/a.
set -u
cd "$(dirname "$0")/.."
# Repo-local cache: ~/.cache is wiped between rounds (round-5 observation).
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
OUT=docs/metrics
mkdir -p "$OUT"

run() {
  echo "== $*" >&2
  timeout 2400 python -m stencilstream_tpu.bench max_perf "$@" --out-dir "$OUT" \
    2>&1 | grep -v -i warning
}

# hotspot + jacobi tiling across sizes. Mid sizes run the 128-row-window
# tune; the peak size runs the headline tune (224-row strips, p=16) LAST so
# the per-size artifact keeps the best-known config, exactly like the
# reference's per-size tuned tables (examples/jacobi/kernels.hpp:236-253).
for size in 1024 2048 4096; do
  case $size in
    1024) n=65536;; 2048) n=16384;; 4096) n=8192;;
  esac
  run hotspot --backend tiling --size $size --n-iterations $n \
      --strip-rows 112 --iters-per-pass 8 --unroll 8
  run jacobi --variant jacobi5_general --backend tiling --size $size \
      --n-iterations $n --strip-rows 112 --iters-per-pass 8 --unroll 8 \
      --shift-impl roll
done
run hotspot --backend tiling --size 8192 --n-iterations 4096 \
    --strip-rows 224 --iters-per-pass 16 --unroll 16
run jacobi --variant jacobi5_general --backend tiling --size 8192 \
    --n-iterations 4096 --strip-rows 224 --iters-per-pass 16 --unroll 16 \
    --shift-impl roll

# monotile: every VMEM-resident size. hotspot 1536^2 needs the residency
# override (the invariant power plane is elided from the carry, so the true
# live set fits physical VMEM — same mechanism as fdtd monotile 1024^2).
for size in 1024 2048; do
  case $size in 1024) n=131072;; 2048) n=65536;; esac
  run hotspot --backend monotile --size $size --n-iterations $n --unroll 8 || true
  run jacobi --variant jacobi5_general --backend monotile --size $size \
      --n-iterations $n --unroll 8
done
run hotspot --backend monotile --size 1536 --n-iterations 65536 --unroll 8 \
    --vmem-budget $((200 * 1024 * 1024)) || true

# fdtd: tiling across sizes + monotile where resident (the round-2 headline)
for size in 512 1024 2048; do
  case $size in 512) n=131072;; 1024) n=65536;; 2048) n=16384;; esac
  run fdtd --backend tiling --size $size --n-iterations $n \
      --strip-rows 96 --iters-per-pass 8 --unroll 8
done
for size in 512 1024; do
  case $size in 512) n=262144;; 1024) n=131072;; esac
  run fdtd --backend monotile --size $size --n-iterations $n --unroll 4 \
      --vmem-budget $((200 * 1024 * 1024))
done

# convection: the PRODUCTION (straight, lean Err) kernel across scales
# (round 4: masks are LICM-hoisted, measured faster than folded); the cuda-
# benchmark scale (3072 -> 3071x1023) runs the tuned p=16 config last.
for size in 768 1536; do
  case $size in 768) n=32768;; 1536) n=16384;; esac
  run convection --backend tiling --size $size --n-iterations $n \
      --strip-rows 128 --iters-per-pass 4 --unroll 4
done
run convection --backend tiling --size 3072 --n-iterations 8192 \
    --strip-rows 160 --iters-per-pass 16 --unroll 16

python -m stencilstream_tpu.bench.curves "$OUT" -o docs/throughput_curves.md \
  --note "Missing cells are VMEM-geometry bounds, not unrecorded points: \
monotile requires the whole grid resident (hotspot > 1536^2, jacobi > 2048^2, \
fdtd > 1024^2 exceed the residency budget even with invariant-plane elision); \
fdtd/convection grids are derived from their experiment configs at the listed \
scales."
