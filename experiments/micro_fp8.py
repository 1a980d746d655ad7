"""fp8 (float8_e4m3) storage: on-chip validation + marginal rate.

The storage_cast wrapper is dtype-parametric; CPU-mesh tests pin the
numerics contract (tests/test_storage_cast.py). This script answers the
two hardware questions: does Mosaic lower the fp8 window ops at all, and
what does quartered HBM traffic + 4x-packed shift lanes buy at the tuned
jacobi tiling config?

Usage: python experiments/micro_fp8.py [size]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from stencilstream_tpu.core import Params
from stencilstream_tpu.backends import create_update
from stencilstream_tpu.backends.storage_cast import CastStorageKernel, cast_storage


def main(size=8192):
    import jax.numpy as jnp

    from stencilstream_tpu.models import jacobi

    f8 = jnp.float8_e4m3fn
    kernel = jacobi.make_kernel("jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3])
    halo = jnp.float32(0.0)

    # 1) correctness vs the f32 oracle: max-abs-error TRAJECTORY over
    #    increasing iteration counts (adoption needs an error bound with a
    #    growth shape, not one smoke point — VERDICT r4 #7), with bf16 at
    #    the same points for context. Jacobi5 with sum(weights)=1 is a
    #    contraction, so storage-rounding errors should saturate, not grow.
    g_small = jacobi.init_grid(512, 512)
    print("[error trajectory 512^2, tiling strip 64 p=2, vs f32 oracle]",
          flush=True)
    print("  iters | bf16 max-abs-err | fp8 max-abs-err", flush=True)
    for n_it in (4, 16, 64, 256):
        ref = create_update(
            Params(transition_function=kernel, halo_value=halo,
                   n_iterations=n_it, blocking=True),
            backend="reference")(g_small).to_numpy()
        errs = []
        for dt in (jnp.bfloat16, f8):
            up = create_update(
                Params(transition_function=CastStorageKernel(kernel, dt),
                       halo_value=halo, n_iterations=n_it, blocking=True),
                backend="tiling", strip_rows=64, iters_per_pass=2)
            up.fallback_to_reference = False
            out = up(cast_storage(g_small, dt))
            errs.append(
                np.abs(np.asarray(out.arrays, np.float32) - ref).max())
        print(f"  {n_it:5d} | {errs[0]:.6f} | {errs[1]:.4f}", flush=True)

    # 2) marginal rate at the tuned config
    grid = cast_storage(jacobi.init_grid(size, size), f8)
    kw = dict(strip_rows=224, iters_per_pass=16, unroll=16)

    def wall(n):
        u = create_update(
            Params(transition_function=CastStorageKernel(kernel, f8),
                   halo_value=halo, n_iterations=n, blocking=True),
            backend="tiling", **kw)
        u.fallback_to_reference = False
        t0 = time.perf_counter()
        u(grid)
        print(f"  [fp8 n={n}] compiled+ran in {time.perf_counter()-t0:.0f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            u(grid)
            best = min(best, time.perf_counter() - t0)
        return best

    w1, w2 = wall(256), wall(1024)
    rate = size * size * (1024 - 256) / (w2 - w1) / 1e9
    print(f"[jacobi {size}^2] fp8 storage {kw}: {rate:.2f} GCell/s marginal",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
