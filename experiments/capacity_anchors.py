"""Monotile capacity-law anchors (VERDICT r3 weak #6): measure whether the
claimed-infeasible points really are, so the law can account for
invariant-field elision with evidence.

* hotspot 2048^2, vmem_budget=200 MiB — the docstring claims this
  "genuinely exhausts VMEM"; measure (compile may fail or be slow).
* jacobi 2048^2 is the committed-good anchor (226 GCell/s round 3).
* jacobi 3072^2, vmem_budget=300 MiB — 1 field x 36 MiB; does residency
  stretch?
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import create_update


def measure(label, grid, kernel, halo, n, **kw):
    try:
        up = create_update(
            Params(transition_function=kernel, halo_value=halo,
                   n_iterations=n, blocking=True),
            backend="monotile", **kw)
        up.fallback_to_reference = False
        t0 = time.perf_counter()
        up(grid)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            up(grid)
            best = min(best, time.perf_counter() - t0)
        cells = grid.shape[0] * grid.shape[1]
        print(f"{label}: {cells*n/best/1e9:.1f} GCell/s "
              f"(compile {compile_s:.0f}s, wall {best:.3f}s)", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


def hotspot(size):
    from stencilstream_tpu.models.hotspot import HotspotCell, derive_coefficients
    rng = np.random.default_rng(42)
    grid = Grid.from_numpy(HotspotCell(
        temp=rng.uniform(70, 90, (size, size)).astype(np.float32),
        power=rng.uniform(0, 1e-3, (size, size)).astype(np.float32)))
    return grid, derive_coefficients(size, size), HotspotCell(
        temp=jnp.float32(0), power=jnp.float32(0))


def jacobi(size):
    from stencilstream_tpu.models import jacobi as J
    return (J.init_grid(size, size),
            J.make_kernel("jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3]),
            jnp.float32(0.0))


g, k, h = hotspot(2048)
measure("hotspot 2048^2 monotile u8 200MiB", g, k, h, 4096,
        unroll=8, vmem_budget=200 * 1024 * 1024)
g, k, h = jacobi(3072)
measure("jacobi 3072^2 monotile u8 300MiB", g, k, h, 4096,
        unroll=8, vmem_budget=300 * 1024 * 1024)
