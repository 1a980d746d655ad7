"""Line-cache PRODUCT measurement for hotspot + fdtd (VERDICT r3 #3).

Round 3 proved the zero-redundancy line-cache discipline loses to pad-mode
for jacobi (5-point, 13 op-slots/cell) and explicitly deferred the two
kernels whose op mix amortizes the tap structure differently:

* hotspot — 15 ops/cell, 2-field (8 B) cells, tiling 8192^2;
* fdtd    — 22 nominal ops/cell, 8-field (32 B) cells, k=2, tiling 1024^2.

Protocol: same-session marginal A/B (pad vs window_mode="linecache") at
each app's TUNED strip geometry, min-of-3 per pass count, marginal rate
cells*p*(n2-n1)/(t2-t1). The linecache eligibility gate coerces concat
shifts to roll (concat column shifts crash Mosaic under the line-cache tap
graph); the pad arm keeps the app's production shift_impl.

Usage: python experiments/lc_product.py [hotspot|fdtd|both]
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

# The first run of this experiment (round-4 session D) died in the
# remote-compile tunnel with no traceback after ~40 min. Dump all stacks
# every 10 min so a recurrence is diagnosable from the log.
faulthandler.enable()
faulthandler.dump_traceback_later(600, repeat=True)


def marginal(grid, make_update, n1=256, n2=1024):
    def wall(n):
        up = make_update(n)
        up.fallback_to_reference = False
        print(f"    [n={n}] compiling...", flush=True)
        t0 = time.perf_counter()
        up(grid)
        compile_s = time.perf_counter() - t0
        print(f"    [n={n}] compiled+ran in {compile_s:.0f}s; timing...",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            up(grid)
            best = min(best, time.perf_counter() - t0)
        return best, compile_s, up

    (w1, c1, _), (w2, c2, up) = wall(n1), wall(n2)
    cells = grid.shape[0] * grid.shape[1]
    rate = cells * (n2 - n1) / (w2 - w1) / 1e9
    return rate, c1 + c2, up


def run_hotspot():
    import jax.numpy as jnp

    from stencilstream_tpu.models.hotspot import HotspotCell, derive_coefficients

    size = 8192
    rng = np.random.default_rng(42)
    grid = Grid.from_numpy(HotspotCell(
        temp=rng.uniform(70, 90, (size, size)).astype(np.float32),
        power=rng.uniform(0, 1e-3, (size, size)).astype(np.float32)))
    kernel = derive_coefficients(size, size)
    halo = HotspotCell(temp=jnp.float32(0), power=jnp.float32(0))
    base = dict(strip_rows=224, iters_per_pass=16, unroll=16)

    # Three arms: production pad (concat shifts), pad+roll (isolates the
    # shift lowering — the linecache gate coerces concat->roll, so without
    # this arm a LC-vs-pad delta confounds window discipline with shift
    # impl), and linecache (roll).
    arms = [
        ("pad+concat", {}),
        ("pad+roll", {"shift_impl": "roll"}),
        ("linecache", {"window_mode": "linecache"}),
        # Smaller-window pair: hedges the known Mosaic large-window
        # pathologies AND separates the discipline question from the
        # window-height question.
        ("pad+roll-112x8", {"shift_impl": "roll", "strip_rows": 112,
                            "iters_per_pass": 8, "unroll": 8}),
        ("linecache-112x8", {"window_mode": "linecache", "strip_rows": 112,
                             "iters_per_pass": 8, "unroll": 8}),
    ]
    for label, extra in arms:
        def make(n, extra=extra):
            return create_update(
                Params(transition_function=kernel, halo_value=halo,
                       n_iterations=n, blocking=True),
                backend="tiling", **{**base, **extra})

        print(f"[hotspot {size}^2] arm {label} starting", flush=True)
        try:
            rate, comp, up = marginal(grid, make)
        except Exception:
            traceback.print_exc()
            print(f"[hotspot {size}^2] {label}: FAILED (see traceback)",
                  flush=True)
            continue
        mode = getattr(up, "resolved_config", {}).get("window_mode", "?")
        print(f"[hotspot {size}^2] {label} (resolved={mode}) {base}: "
              f"{rate:.2f} GCell/s marginal (compile {comp:.0f}s)", flush=True)


def run_fdtd():
    from stencilstream_tpu.models import fdtd

    params = fdtd.Parameters.from_json(
        {
            "tau": 100e-15,
            "dx": 1.5655577299412914e-9,
            "time": {"t_cutoff": 7.0, "t_detect": 14.0, "t_max": 15.0},
            "source": {"frequency": 120e12, "phase": 3.0, "x": 0, "y": 0,
                       "radius": 0},
            "cavity_rings": [
                {"radius": 800e-9, "mu_r": 11.56, "eps_r": 1.0, "sigma": 0.0}
            ],
        }
    )
    resolver = fdtd.CoefResolver(params)
    grid = fdtd.init_grid(params, resolver)
    base = dict(fdtd.TUNED.get("tiling", {}))
    base.setdefault("strip_rows", 96)
    base.setdefault("iters_per_pass", 8)
    base.setdefault("unroll", 8)

    arms = [
        ("pad+concat", {}),
        ("pad+roll", {"shift_impl": "roll"}),
        ("linecache", {"window_mode": "linecache"}),
    ]
    for label, extra in arms:
        def make(n, extra=extra):
            update, _ = fdtd.build_simulation(
                params, resolver=resolver, backend="tiling", n_iterations=n,
                tdv_strategy="inline", **{**base, **extra})
            return update

        print(f"[fdtd {grid.shape[0]}x{grid.shape[1]}] arm {label} starting",
              flush=True)
        try:
            # The ~1024^2 fdtd grid needs far larger run lengths than the
            # 8192^2 apps: at 256/1024 iters the marginal denominator is
            # ~10 ms — inside timer noise (the round-5 F2 run measured a
            # NEGATIVE marginal that way). 16384/65536 puts it at ~0.6 s.
            rate, comp, up = marginal(grid, make, n1=16384, n2=65536)
        except Exception:
            traceback.print_exc()
            print(f"[fdtd] {label}: FAILED (see traceback)", flush=True)
            continue
        mode = getattr(up, "resolved_config", {}).get("window_mode", "?")
        print(f"[fdtd {grid.shape[0]}x{grid.shape[1]}] {label} "
              f"(resolved={mode}) {base}: {rate:.2f} GCell/s marginal "
              f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("hotspot", "both"):
        run_hotspot()
    if which in ("fdtd", "both"):
        run_fdtd()
