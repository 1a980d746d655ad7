"""On-chip A/B: production tiling path, window_mode=linecache vs clamped.

Runs the PRODUCT code (create_update -> _run_tiling -> LineCachePass + band
StripPass) on jacobi5/hotspot at the benchmark geometry, so the number is the
one bench.py would record. Marginal-rate protocol (two run lengths, delta)
cancels per-call dispatch/fetch overhead of the tunneled runtime.

Usage: python experiments/sweep_linecache.py --app jacobi --variants \
    clamped224x16,lc128x16,lc192x16,lc256x16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import create_update


def build_case(app: str, size: int):
    rng = np.random.default_rng(42)
    if app == "jacobi":
        from stencilstream_tpu.models import jacobi

        tf = jacobi.make_kernel("jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3])
        grid = jacobi.init_grid(size, size)
        halo = None
        extra = dict(shift_impl="roll")
    elif app == "hotspot":
        from stencilstream_tpu.models.hotspot import HotspotCell, derive_coefficients

        grid = Grid.from_numpy(
            HotspotCell(
                temp=rng.uniform(70.0, 90.0, (size, size)).astype(np.float32),
                power=rng.uniform(0.0, 1e-3, (size, size)).astype(np.float32),
            )
        )
        tf = derive_coefficients(size, size)
        halo = HotspotCell(temp=jnp.float32(0.0), power=jnp.float32(0.0))
        extra = {}
    else:
        raise ValueError(app)
    return tf, grid, halo, extra


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--app", default="jacobi")
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument(
        "--variants",
        default="clamped224x16,lc128x16,lc192x16,lc256x16",
    )
    ap.add_argument("--iters", type=int, default=2048)
    args = ap.parse_args()

    tf, grid, halo, extra = build_case(args.app, args.size)
    cells = grid.shape[0] * grid.shape[1]

    for v in args.variants.split(","):
        mode = "linecache" if v.startswith("lc") else "clamped"
        T, p = map(int, v.replace("lc", "").replace("clamped", "").split("x"))
        label = f"{args.app} {mode} T={T} p={p}"
        try:
            n1 = max(args.iters // 4 // p * p, p)
            n2 = max(args.iters // p * p, 2 * p)

            def make(n):
                up = create_update(
                    Params(
                        transition_function=tf,
                        halo_value=halo,
                        n_iterations=n,
                        blocking=True,
                    ),
                    backend="tiling",
                    strip_rows=T,
                    iters_per_pass=p,
                    unroll=min(16, p),
                    window_mode=mode,
                    **extra,
                )
                up.fallback_to_reference = False
                return up

            up1, up2 = make(n1), make(n2)
            t0 = time.perf_counter()
            up1(grid).block_until_ready()
            compile_s = time.perf_counter() - t0
            up2(grid).block_until_ready()

            def timed(up):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    up(grid).block_until_ready()
                    best = min(best, time.perf_counter() - t0)
                return best

            w1, w2 = timed(up1), timed(up2)
            gc = cells * (n2 - n1) / (w2 - w1) / 1e9
            print(
                f"{label:32s}: {gc:7.2f} GCell/s marginal "
                f"(w1 {w1:.3f}s/{n1}, w2 {w2:.3f}s/{n2}, compile {compile_s:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(
                f"{label:32s}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:140]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
