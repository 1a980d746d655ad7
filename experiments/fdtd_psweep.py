"""fdtd tiling config sweep: deeper temporal blocking for the one
bandwidth-bound bench row (VERDICT r4 #3).

BENCH_DETAILS round 4: fdtd_tiling (strip 96, p=8) has memory_time_fraction
0.94 — the row is HBM-starved at 32 B cells. Doubling iters_per_pass halves
the per-iteration HBM traffic at a ~5% compute-redundancy cost
((T+2hp)/T: 96@p8 -> 1.33, 160@p16 -> 1.40), which the analytic model says
is worth ~1.8x IF Mosaic tolerates the 2x-deeper fused chain (k=2 means
p=16 fuses 32 substeps). The round-2 sweep that chose p=8 predates the
dtype-weighted model and never probed p=16 at taller strips.

Arms sweep (strip_rows, iters_per_pass) at unroll=p, roll shifts off
(production default), marginal protocol with run lengths sized out of
timer noise (the ~1024^2 grid needs ~48k iters for a ~0.5 s denominator).

Usage: python experiments/fdtd_psweep.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

# Stack dumps every 10 min make a hung Mosaic compile diagnosable.
import faulthandler

faulthandler.enable()
faulthandler.dump_traceback_later(600, repeat=True)

from stencilstream_tpu.models import fdtd


def build():
    params = fdtd.Parameters.from_json({
        "tau": 100e-15,
        "dx": 1.5655577299412914e-9,
        "time": {"t_cutoff": 7.0, "t_detect": 14.0, "t_max": 15.0},
        "source": {"frequency": 120e12, "phase": 3.0, "x": 0, "y": 0,
                   "radius": 0},
        "cavity_rings": [
            {"radius": 800e-9, "mu_r": 11.56, "eps_r": 1.0, "sigma": 0.0}],
    })
    resolver = fdtd.CoefResolver(params)
    grid = fdtd.init_grid(params, resolver)
    return params, resolver, grid


def marginal(params, resolver, grid, kw, n1, n2):
    def wall(n):
        update, _ = fdtd.build_simulation(
            params, resolver=resolver, backend="tiling", n_iterations=n,
            tdv_strategy="inline", **kw)
        update.fallback_to_reference = False
        t0 = time.perf_counter()
        update(grid)
        print(f"    [n={n}] compiled+ran in {time.perf_counter() - t0:.0f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            update(grid)
            best = min(best, time.perf_counter() - t0)
        return best, update

    (w1, _), (w2, up) = wall(n1), wall(n2)
    cells = grid.shape[0] * grid.shape[1]
    return cells * (n2 - n1) / (w2 - w1) / 1e9, up


def main():
    params, resolver, grid = build()
    h, w = grid.shape
    n1 = max(256, int(round(50e9 / (h * w) / 256)) * 256)
    n2 = 4 * n1
    arms = [
        (96, 8),    # production baseline (TUNED)
        (96, 16),   # 2x temporal depth, same strip
        (160, 16),  # 2x depth + taller strip (redundancy 1.40)
        (224, 16),  # redundancy 1.29; 288-row window — compile risk arm
    ]
    for strip, p in arms:
        kw = dict(strip_rows=strip, iters_per_pass=p, unroll=p)
        print(f"[fdtd {h}x{w}] strip {strip} p{p} starting (n={n1}/{n2})",
              flush=True)
        try:
            rate, up = marginal(params, resolver, grid, kw, n1, n2)
        except Exception as e:
            print(f"[fdtd {h}x{w}] strip {strip} p{p}: FAILED "
                  f"{type(e).__name__}: {e}", flush=True)
            continue
        rc = getattr(up, "resolved_config", None) or {}
        print(f"[fdtd {h}x{w}] strip {strip} p{p} "
              f"(resolved p={rc.get('iters_per_pass')}, "
              f"strip={rc.get('strip_rows')}): {rate:.2f} GCell/s marginal",
              flush=True)


if __name__ == "__main__":
    main()
