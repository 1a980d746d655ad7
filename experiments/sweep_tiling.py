"""Config sweep for the tiling backend in the HBM-resident regime (8192^2).

Round-2 tuning harness for VERDICT item #1: sweep strip_rows x iters_per_pass
x unroll x shift_impl on the real chip, record GCell/s per config, and write
the table to experiments/sweep_<app>.json. The per-case protocol matches
bench.py (warmup compile run, then min over samples).

Usage:
    python experiments/sweep_tiling.py jacobi --size 8192 --iters 512
    python experiments/sweep_tiling.py hotspot --grid "strip=256,p=4,unroll=4"
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import create_update

BASELINES = {"jacobi": 176.08, "hotspot": 122.7}
FLOPS = {"jacobi": 9, "hotspot": 15}


def make_case(app: str, size: int):
    rng = np.random.default_rng(42)
    if app == "hotspot":
        from stencilstream_tpu.models.hotspot import HotspotCell, derive_coefficients

        grid = Grid.from_numpy(
            HotspotCell(
                temp=rng.uniform(70.0, 90.0, (size, size)).astype(np.float32),
                power=rng.uniform(0.0, 1e-3, (size, size)).astype(np.float32),
            )
        )
        kernel = derive_coefficients(size, size)
        halo = HotspotCell(temp=jnp.float32(0.0), power=jnp.float32(0.0))
    else:
        from stencilstream_tpu.models import jacobi

        kernel = jacobi.make_kernel("jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3])
        grid = jacobi.init_grid(size, size)
        halo = None
    return grid, kernel, halo


def run_config(grid, kernel, halo, n_iterations, samples=2, **kw):
    params = Params(
        transition_function=kernel,
        halo_value=halo,
        n_iterations=n_iterations,
        blocking=True,
    )
    update = create_update(params, backend="tiling", **kw)
    update.fallback_to_reference = False
    t0 = time.perf_counter()
    update(grid).block_until_ready()  # compile + warmup
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        update(grid).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("app", choices=["jacobi", "hotspot"])
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--strips", type=str, default="64,128,256,512")
    ap.add_argument("--ps", type=str, default="2,4,8")
    ap.add_argument("--unrolls", type=str, default="0")
    ap.add_argument("--shift", type=str, default="concat,roll")
    ap.add_argument("--samples", type=int, default=2)
    args = ap.parse_args()

    grid, kernel, halo = make_case(args.app, args.size)
    baseline = BASELINES[args.app]
    flops = FLOPS[args.app]
    cells = args.size * args.size * args.iters

    combos = list(
        itertools.product(
            [int(s) for s in args.strips.split(",")],
            [int(p) for p in args.ps.split(",")],
            [int(u) for u in args.unrolls.split(",")],
            args.shift.split(","),
        )
    )
    results = []
    for strip, p, unroll, shift in combos:
        u = unroll if unroll else p  # 0 => fully unroll the p-loop
        label = f"strip={strip} p={p} unroll={u} shift={shift}"
        try:
            wall, compile_s = run_config(
                grid, kernel, halo, args.iters,
                samples=args.samples,
                strip_rows=strip, iters_per_pass=p, unroll=u, shift_impl=shift,
            )
            gc = cells / wall / 1e9
            results.append(
                dict(strip=strip, p=p, unroll=u, shift=shift, wall=wall,
                     gcells=gc, vs_baseline=gc / baseline, tflops=gc * flops / 1e3)
            )
            print(f"[{label}] {gc:7.2f} GCell/s  {gc/baseline:5.2f}x  "
                  f"({gc*flops/1e3:.2f} TFLOP/s, wall {wall:.3f}s, "
                  f"compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"[{label}] FAILED {type(e).__name__}: {e}", flush=True)
            results.append(dict(strip=strip, p=p, unroll=u, shift=shift,
                                error=f"{type(e).__name__}: {e}"))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"sweep_{args.app}.json")
    with open(out, "w") as f:
        json.dump(dict(app=args.app, size=args.size, iters=args.iters,
                       device=str(jax.devices()[0]), results=results), f, indent=2)
    ok = [r for r in results if "gcells" in r]
    if ok:
        best = max(ok, key=lambda r: r["gcells"])
        print(f"\nBEST: strip={best['strip']} p={best['p']} unroll={best['unroll']} "
              f"shift={best['shift']} -> {best['gcells']:.2f} GCell/s "
              f"({best['vs_baseline']:.2f}x)")


if __name__ == "__main__":
    main()
