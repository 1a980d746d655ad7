"""bf16-STORAGE A/B for the HBM-regime (tiling) kernels — VERDICT r3 #4a.

Same-session marginal-rate comparison (chip drifts ~8% between sessions) of
f32 storage vs bf16 storage at the SAME strip config: storing f32 cells as
bf16 halves the per-pass HBM bytes; whether that moves the needle at p=16
depends on how close the row already sits to the compute ceiling.

Usage: python experiments/micro_bf16.py [jacobi|hotspot|both] [size]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import create_update
from stencilstream_tpu.backends.storage_cast import CastStorageKernel, cast_storage


def build(app, size):
    import jax.numpy as jnp

    if app == "jacobi":
        from stencilstream_tpu.models import jacobi

        kernel = jacobi.make_kernel("jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3])
        grid = jacobi.init_grid(size, size)
        halo = jnp.float32(0.0)
        kw = dict(strip_rows=224, iters_per_pass=16, unroll=16,
                  shift_impl="roll")
        flops = 9
    elif app == "fdtd":
        # Bandwidth-bound row (BENCH_DETAILS round 4: memory_time_fraction
        # 0.94 at 32 B cells, p=8) — the regime bf16 storage targets.
        from stencilstream_tpu.models import fdtd

        params = fdtd.Parameters.from_json({
            "tau": 100e-15,
            "dx": 1.5655577299412914e-9,
            "time": {"t_cutoff": 7.0, "t_detect": 14.0, "t_max": 15.0},
            "source": {"frequency": 120e12, "phase": 3.0, "x": 0, "y": 0,
                       "radius": 0},
            "cavity_rings": [
                {"radius": 800e-9, "mu_r": 11.56, "eps_r": 1.0,
                 "sigma": 0.0}],
        })
        resolver = fdtd.CoefResolver(params)
        grid = fdtd.init_grid(params, resolver)
        kernel = fdtd.make_kernel(params, resolver)
        halo = resolver.halo_cell()
        kw = dict(fdtd.TUNED.get("tiling", {}))
        kw.setdefault("strip_rows", 96)
        kw.setdefault("iters_per_pass", 8)
        kw.setdefault("unroll", 8)
        flops = 22
    else:
        from stencilstream_tpu.models.hotspot import HotspotCell, derive_coefficients

        rng = np.random.default_rng(42)
        grid = Grid.from_numpy(HotspotCell(
            temp=rng.uniform(70, 90, (size, size)).astype(np.float32),
            power=rng.uniform(0, 1e-3, (size, size)).astype(np.float32)))
        kernel = derive_coefficients(size, size)
        halo = HotspotCell(temp=jnp.float32(0), power=jnp.float32(0))
        kw = dict(strip_rows=224, iters_per_pass=16, unroll=16)
        flops = 15
    return grid, kernel, halo, kw, flops


def marginal(grid, kernel, halo, kw, n1=256, n2=1024):
    """Marginal rate between two run lengths. n1/n2 must be large enough
    that (w2 - w1) is seconds, not noise: the round-5 F2 run measured a
    NEGATIVE fdtd marginal because 1024^2 x (1024-256) iters is only ~10 ms
    of work — per-app counts are scaled in run() so the denominator is
    O(0.5 s) at the row's measured rate."""
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


def run(app, size):
    grid, kernel, halo, kw, flops = build(app, size)
    h, w = grid.shape
    # Scale the marginal-rate run lengths so the w2-w1 denominator is ~0.5 s
    # of device time at ~100 GCell/s — on the small fdtd grid the old fixed
    # 256/1024 counts left it inside timer noise (negative marginal, F2).
    n_half_s = max(256, int(round(50e9 / (h * w) / 256)) * 256)
    n1, n2 = n_half_s, 4 * n_half_s
    g_f32 = marginal(grid, kernel, halo, kw, n1, n2)
    print(f"[{app} {h}x{w}] f32 storage {kw} (n={n1}/{n2}): "
          f"{g_f32:.2f} GCell/s marginal", flush=True)
    g_bf = marginal(cast_storage(grid), CastStorageKernel(kernel), halo, kw,
                    n1, n2)
    print(f"[{app} {h}x{w}] bf16 storage same config: {g_bf:.2f} GCell/s "
          f"marginal ({g_bf / g_f32:.3f}x)", flush=True)
    return g_f32, g_bf


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    for app in (["jacobi", "hotspot"] if which == "both" else [which]):
        run(app, size)
