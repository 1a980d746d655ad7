"""bf16-storage follow-ups (round 4, session E).

E1 — isolate the shift lowering from the storage dtype: the D1 jacobi A/B
compared f32+roll (tuned) against bf16+concat (Mosaic rotate is 32-bit
only, so bf16 coerces to concat). An f32+concat arm at the same config
splits the 1.22x win into its roll->concat and f32->bf16 components.

E2 — hotspot bf16 RE-measure with the passthrough-invariance fix
(storage_cast memoized taps): D1 measured 0.825x because the upcast->
downcast round-trip made the invariant power plane loop-variant (it was
re-written every sub-step). With elision restored the weighted model
predicts ~1.13x compute x halved memory share.

Usage: python experiments/micro_bf16_iso.py [e1|e2|both]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import create_update
from stencilstream_tpu.backends.storage_cast import CastStorageKernel, cast_storage


def marginal(grid, kernel, halo, kw, n1=256, n2=1024):
    def wall(n):
        up = create_update(
            Params(transition_function=kernel, halo_value=halo,
                   n_iterations=n, blocking=True),
            backend="tiling", **kw)
        up.fallback_to_reference = False
        up(grid)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            up(grid)
            best = min(best, time.perf_counter() - t0)
        return best

    w1, w2 = wall(n1), wall(n2)
    cells = grid.shape[0] * grid.shape[1]
    return cells * (n2 - n1) / (w2 - w1) / 1e9


def e1():
    import jax.numpy as jnp

    from stencilstream_tpu.models import jacobi

    kernel = jacobi.make_kernel("jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3])
    grid = jacobi.init_grid(8192, 8192)
    halo = jnp.float32(0.0)
    base = dict(strip_rows=224, iters_per_pass=16, unroll=16)
    for label, kw, g, k in [
        ("f32+roll", dict(base, shift_impl="roll"), grid, kernel),
        ("f32+concat", base, grid, kernel),
        ("bf16+concat", base, cast_storage(grid), CastStorageKernel(kernel)),
    ]:
        rate = marginal(g, k, halo, kw)
        print(f"[jacobi 8192^2] {label}: {rate:.2f} GCell/s marginal",
              flush=True)


def e2():
    import jax.numpy as jnp

    from stencilstream_tpu.models.hotspot import HotspotCell, derive_coefficients

    size = 8192
    rng = np.random.default_rng(42)
    grid = Grid.from_numpy(HotspotCell(
        temp=rng.uniform(70, 90, (size, size)).astype(np.float32),
        power=rng.uniform(0, 1e-3, (size, size)).astype(np.float32)))
    kernel = derive_coefficients(size, size)
    halo = HotspotCell(temp=jnp.float32(0), power=jnp.float32(0))
    kw = dict(strip_rows=224, iters_per_pass=16, unroll=16)
    g32 = marginal(grid, kernel, halo, kw)
    print(f"[hotspot {size}^2] f32 storage: {g32:.2f} GCell/s marginal",
          flush=True)
    gbf = marginal(cast_storage(grid), CastStorageKernel(kernel), halo, kw)
    print(f"[hotspot {size}^2] bf16 storage (passthrough fix): "
          f"{gbf:.2f} GCell/s marginal ({gbf / g32:.3f}x)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("e1", "both"):
        e1()
    if which in ("e2", "both"):
        e2()
