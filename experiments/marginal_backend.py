"""Marginal-rate measurement of the production backends (cancels the fixed
per-call dispatch/fetch cost of the tunneled runtime).

Usage: python experiments/marginal_backend.py [app] [backend] [size]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import create_update


def measure(app="jacobi", backend="tiling", size=8192, n1=256, n2=1024, **kw):
    if app == "jacobi":
        from stencilstream_tpu.models import jacobi

        kernel = jacobi.make_kernel("jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3])
        grid = jacobi.init_grid(size, size)
        halo = None
        flops = 9
    else:
        from stencilstream_tpu.models.hotspot import HotspotCell, derive_coefficients
        import jax.numpy as jnp

        rng = np.random.default_rng(42)
        grid = Grid.from_numpy(HotspotCell(
            temp=rng.uniform(70, 90, (size, size)).astype(np.float32),
            power=rng.uniform(0, 1e-3, (size, size)).astype(np.float32)))
        kernel = derive_coefficients(size, size)
        halo = HotspotCell(temp=jnp.float32(0), power=jnp.float32(0))
        flops = 15

    def wall(n):
        up = create_update(
            Params(transition_function=kernel, halo_value=halo,
                   n_iterations=n, blocking=True),
            backend=backend, **kw)
        up.fallback_to_reference = False
        up(grid)  # compile+warmup (Grid.block_until_ready fetches)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            up(grid)
            best = min(best, time.perf_counter() - t0)
        return best

    w1, w2 = wall(n1), wall(n2)
    gc = size * size * (n2 - n1) / (w2 - w1) / 1e9
    print(f"{app} {backend} {size}^2 {kw}: marginal {gc:.2f} GCell/s "
          f"({gc*flops/1e3:.2f} TFLOP/s useful; w {w1:.3f}/{w2:.3f}s)")
    return gc


if __name__ == "__main__":
    app = sys.argv[1] if len(sys.argv) > 1 else "jacobi"
    backend = sys.argv[2] if len(sys.argv) > 2 else "tiling"
    kw = dict(strip_rows=128, iters_per_pass=8, unroll=8)
    measure(app, backend, **kw)
