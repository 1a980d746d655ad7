"""Measure FDTD and Convection at reference-class scale (VERDICT #3).

FDTD: the reference's mono_benchmark geometry (dx=1.5656e-9, ring 800nm ->
1024^2 grid, examples/fdtd/experiments/mono_benchmark.json). Convection: the
cuda-benchmark experiment (res=1024, lx=3 -> 3071x1023 active,
examples/convection/experiments/cuda-benchmark.json). Marginal timing.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from stencilstream_tpu.core import Params
from stencilstream_tpu.backends import create_update


def marginal(update_for, grid, n1, n2, cells):
    def wall(n):
        up = update_for(n)
        up.fallback_to_reference = False
        up(grid)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            up(grid)
            best = min(best, time.perf_counter() - t0)
        return best

    w1, w2 = wall(n1), wall(n2)
    return cells * (n2 - n1) / (w2 - w1) / 1e9, w1, w2


def bench_fdtd(backend="tiling", n1=128, n2=512, **kw):
    from stencilstream_tpu.models import fdtd

    params = fdtd.Parameters.load(
        "/root/reference/examples/fdtd/experiments/mono_benchmark.json"
    )
    resolver = fdtd.CoefResolver(params)
    grid = fdtd.init_grid(params, resolver)
    H, W = grid.shape

    def update_for(n):
        update, _ = fdtd.build_simulation(
            params, resolver=resolver, backend=backend, n_iterations=n,
            tdv_strategy="precompute_on_host", **kw,
        )
        return update

    gc, w1, w2 = marginal(update_for, grid, n1, n2, H * W)
    print(f"fdtd {H}x{W} {backend} {kw}: marginal {gc:.2f} GCell/s "
          f"({gc*22/1e3:.2f} TFLOP/s at 22 ops; w {w1:.3f}/{w2:.3f}s)", flush=True)
    return gc


def bench_convection(backend="tiling", n1=64, n2=256, **kw):
    from stencilstream_tpu.models import convection

    e = convection.Experiment(
        lx=3.0, ly=1.0, px=1.5, py=0.5, eta0=1.0, DcT=1.0, deltaT=1.0,
        Ra=1e7, Pra=1e3, res=1024, iterMax=50000, nt=100, nout=10,
        nerr=100, epsilon=1e-4, dmp=2.0,
    )
    grid = convection.init_grid(e)
    H, W = grid.shape

    def update_for(n):
        return create_update(
            Params(
                transition_function=convection.make_pseudo_transient_kernel(e),
                halo_value=convection.zero_cell(),
                n_iterations=n,
                blocking=True,
            ),
            backend=backend,
            **kw,
        )

    gc, w1, w2 = marginal(update_for, grid, n1, n2, H * W)
    print(f"convection {H}x{W} {backend} {kw}: marginal {gc:.2f} GCell/s "
          f"({gc*50/1e3:.2f} TFLOP/s at 50 ops; w {w1:.3f}/{w2:.3f}s)", flush=True)
    return gc


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("fdtd", "both"):
        for kw in (dict(strip_rows=128, iters_per_pass=8, unroll=8),
                   dict(strip_rows=128, iters_per_pass=4, unroll=4)):
            try:
                bench_fdtd(**kw)
            except Exception as ex:
                print(f"fdtd {kw} FAILED: {type(ex).__name__}: {str(ex)[:120]}",
                      flush=True)
    if which in ("convection", "both"):
        for kw in (dict(strip_rows=64, iters_per_pass=4, unroll=4),
                   dict(strip_rows=128, iters_per_pass=4, unroll=4)):
            try:
                bench_convection(**kw)
            except Exception as ex:
                print(f"convection {kw} FAILED: {type(ex).__name__}: {str(ex)[:120]}",
                      flush=True)
