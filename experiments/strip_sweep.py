"""Strip-height sweep at fixed p — the window-height lever (round 4).

Pad-mode redundancy is ``(strip + halo) / strip`` per pass: at p=16/k=1/r=1
the compound halo is 16+16 rows, so strip 224 recomputes 1.143x, 320 ->
1.100x, 448 -> 1.071x. Taller strips also amortize pass-boundary effects —
IF Mosaic compiles them (strip >= 512 crashes the remote compiler; 320/448
are unexplored). bf16 storage halves the window bytes, so bf16 arms probe
one VMEM notch taller than f32 can.

Arms are isolated (a compiler crash loses one arm, not the session) and the
marginal protocol excludes fixed dispatch cost.

Usage: python experiments/strip_sweep.py [jacobi_bf16|hotspot|jacobi|all]
"""

from __future__ import annotations

import faulthandler
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np

from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import create_update

faulthandler.enable()
faulthandler.dump_traceback_later(600, repeat=True)

SIZE = 8192


def marginal(grid, make_update, n1=256, n2=1024):
    def wall(n):
        up = make_update(n)
        up.fallback_to_reference = False
        print(f"    [n={n}] compiling...", flush=True)
        t0 = time.perf_counter()
        up(grid)
        print(f"    [n={n}] compiled+ran in {time.perf_counter() - t0:.0f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            up(grid)
            best = min(best, time.perf_counter() - t0)
        return best

    w1, w2 = wall(n1), wall(n2)
    cells = grid.shape[0] * grid.shape[1]
    return cells * (n2 - n1) / (w2 - w1) / 1e9


def build(app):
    import jax.numpy as jnp

    if app.startswith("jacobi"):
        from stencilstream_tpu.models import jacobi

        kernel = jacobi.make_kernel(
            "jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3])
        grid = jacobi.init_grid(SIZE, SIZE)
        halo = jnp.float32(0.0)
        kw = dict(shift_impl="roll")
    else:
        from stencilstream_tpu.models.hotspot import (
            HotspotCell,
            derive_coefficients,
        )

        rng = np.random.default_rng(42)
        grid = Grid.from_numpy(HotspotCell(
            temp=rng.uniform(70, 90, (SIZE, SIZE)).astype(np.float32),
            power=rng.uniform(0, 1e-3, (SIZE, SIZE)).astype(np.float32)))
        kernel = derive_coefficients(SIZE, SIZE)
        halo = HotspotCell(temp=jnp.float32(0), power=jnp.float32(0))
        kw = {}
    if app.endswith("_bf16"):
        from stencilstream_tpu.backends.storage_cast import (
            CastStorageKernel,
            cast_storage,
        )

        kernel = CastStorageKernel(kernel)
        grid = cast_storage(grid)
        kw.pop("shift_impl", None)  # bf16 taps lower as concat regardless
    return grid, kernel, halo, kw


def run(app, strips=(224, 320, 448)):
    grid, kernel, halo, kw = build(app)
    for strip in strips:
        base = dict(strip_rows=strip, iters_per_pass=16, unroll=16, **kw)

        def make(n, base=base):
            return create_update(
                Params(transition_function=kernel, halo_value=halo,
                       n_iterations=n, blocking=True),
                backend="tiling", **base)

        print(f"[{app} {SIZE}^2] strip {strip} p16 starting", flush=True)
        try:
            rate = marginal(grid, make)
        except Exception:
            traceback.print_exc()
            print(f"[{app} {SIZE}^2] strip {strip}: FAILED", flush=True)
            continue
        print(f"[{app} {SIZE}^2] strip {strip} p16: {rate:.2f} GCell/s "
              f"marginal", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    apps = (["jacobi_bf16", "hotspot", "jacobi"]
            if which == "all" else [which])
    for app in apps:
        run(app)
