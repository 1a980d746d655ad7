"""Headline benchmark: HotSpot cell throughput on one TPU chip.

Protocol mirrors the reference's harness (``examples/hotspot/scripts/benchmark.jl``):
warmup run (compile), then N samples, minimum walltime wins, throughput =
cells * iterations / walltime. The baseline is the reference's published peak
— HotSpot on a Stratix-10 FPGA at 1.84 TFLOPS = 122.7 GCell/s at 15 ops/cell
(``/root/reference/README.md:78``, BASELINE.md).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
Extended per-app results go to stderr and BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import create_update

#: Reference baseline: HotSpot monotile peak, BittWare 520N FPGA
#: (1.84 TFLOPS / 15 ops per cell).
BASELINE_HOTSPOT_GCELLS = 122.7
#: Reference baseline: Jacobi tiling peak (176.08 GCell/s, README.md:78).
BASELINE_JACOBI_GCELLS = 176.08

WARMUP_ITERS = 8
SAMPLES = 3


def bench_update(grid: Grid, make_update, n_iterations: int) -> float:
    """Min walltime over SAMPLES runs of n_iterations (after a warmup run of
    the same configuration, which triggers the one compile)."""
    update = make_update(n_iterations)
    # A silent oracle swap must never masquerade as a Pallas number
    # (VERDICT round 1 #9): crash instead of falling back.
    update.fallback_to_reference = False
    update(grid).block_until_ready()  # warmup/compile
    best = float("inf")
    for _ in range(SAMPLES):
        t0 = time.perf_counter()
        update(grid).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_hotspot(size: int = 8192, n_iterations: int = 256, backend: str = "tiling",
                  **backend_kwargs):
    from stencilstream_tpu.models.hotspot import HotspotCell, derive_coefficients
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    grid = Grid.from_numpy(
        HotspotCell(
            temp=rng.uniform(70.0, 90.0, (size, size)).astype(np.float32),
            power=rng.uniform(0.0, 1e-3, (size, size)).astype(np.float32),
        )
    )
    kernel = derive_coefficients(size, size)

    def make_update(n):
        return create_update(
            Params(
                transition_function=kernel,
                halo_value=HotspotCell(temp=jnp.float32(0.0), power=jnp.float32(0.0)),
                n_iterations=n,
                blocking=True,
            ),
            backend=backend,
            **backend_kwargs,
        )

    wall = bench_update(grid, make_update, n_iterations)
    gcells = size * size * n_iterations / wall / 1e9
    return {
        "app": "hotspot",
        "backend": backend,
        "grid": [size, size],
        "n_iterations": n_iterations,
        "walltime_s": wall,
        "gcells_per_s": gcells,
        "gflops": gcells * 15,
        "vs_baseline": gcells / BASELINE_HOTSPOT_GCELLS,
    }


def bench_jacobi(size: int = 8192, n_iterations: int = 256, backend: str = "tiling",
                 **backend_kwargs):
    from stencilstream_tpu.models import jacobi

    kernel = jacobi.make_kernel("jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3])
    grid = jacobi.init_grid(size, size)

    def make_update(n):
        return create_update(
            Params(transition_function=kernel, n_iterations=n, blocking=True),
            backend=backend,
            **backend_kwargs,
        )

    wall = bench_update(grid, make_update, n_iterations)
    gcells = size * size * n_iterations / wall / 1e9
    return {
        "app": "jacobi5_general",
        "backend": backend,
        "grid": [size, size],
        "n_iterations": n_iterations,
        "walltime_s": wall,
        "gcells_per_s": gcells,
        "gflops": gcells * 9,
        "vs_baseline": gcells / BASELINE_JACOBI_GCELLS,
    }


def main() -> int:
    on_tpu = jax.default_backend() == "tpu"
    details = {"device": str(jax.devices()[0]), "backend": jax.default_backend()}

    if on_tpu:
        # Protocol notes: large n_iterations amortizes the ~0.1 s per-call
        # dispatch/sync round-trip of the tunneled runtime; unroll is the
        # cross-substep CSE knob. Monotile peaks on VMEM-resident grids
        # (like the reference's monotile peaks, BASELINE.md), tiling covers
        # the 8192^2 configs.
        cases = [
            ("hotspot_monotile", bench_hotspot,
             dict(size=1280, n_iterations=65536, backend="monotile", unroll=4)),
            ("hotspot_tiling", bench_hotspot,
             dict(size=8192, n_iterations=1024, backend="tiling",
                  strip_rows=64, iters_per_pass=8, unroll=8)),
            ("jacobi_monotile", bench_jacobi,
             dict(size=2048, n_iterations=131072, backend="monotile")),
            ("jacobi_tiling", bench_jacobi,
             dict(size=8192, n_iterations=1024, backend="tiling",
                  strip_rows=128, iters_per_pass=8, unroll=8)),
        ]
    else:
        cases = [
            ("hotspot", bench_hotspot, dict(size=512, n_iterations=8)),
            ("jacobi", bench_jacobi, dict(size=512, n_iterations=8)),
        ]

    results = []
    for label, fn, kw in cases:
        try:
            r = fn(**kw)
            r["case"] = label
            results.append(r)
            print(f"[bench] {label}: {r['gcells_per_s']:.2f} GCell/s "
                  f"({r['vs_baseline']:.2f}x baseline)", file=sys.stderr)
        except Exception as e:  # keep the headline metric robust
            print(f"[bench] {label} failed: {type(e).__name__}: {e}", file=sys.stderr)
            details[f"{label}_error"] = f"{type(e).__name__}: {e}"

    details["results"] = results
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=2)

    hotspot_results = [r for r in results if r["app"] == "hotspot"]
    if not hotspot_results:
        print(json.dumps({"metric": "hotspot_cell_throughput", "value": 0.0,
                          "unit": "GCell/s", "vs_baseline": 0.0}))
        return 1
    # Peak across configs — the same convention as the reference's published
    # per-app peaks (each measured at its own best backend/config).
    head = max(hotspot_results, key=lambda r: r["gcells_per_s"])
    print(json.dumps({
        "metric": "hotspot_cell_throughput",
        "value": round(head["gcells_per_s"], 3),
        "unit": "GCell/s",
        "vs_baseline": round(head["vs_baseline"], 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
