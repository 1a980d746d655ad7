"""Line-cache product A/B, arm-isolated (v2 of lc_product.py).

v1 ran all arms in one process; a single pathological Mosaic compile
(hotspot pad+roll wedged the remote compiler >30 min, round 4 session D)
starved every later arm. v2 runs EACH arm in its own subprocess with its
own timeout, most-valuable-first (the linecache arms are the VERDICT r3
#3 ask; the roll-iso arms are nice-to-have), so one hang costs one arm.

Usage: python experiments/lc_product2.py [--skip-roll]
"""

from __future__ import annotations

import subprocess
import sys

ARM = r"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import create_update

app, label, extra_s = sys.argv[1], sys.argv[2], sys.argv[3]
extra = eval(extra_s)

def marginal(grid, make_update, n1=256, n2=1024):
    def wall(n):
        up = make_update(n)
        up.fallback_to_reference = False
        t0 = time.perf_counter()
        up(grid)
        c = time.perf_counter() - t0
        print(f"  [{label} n={n}] compiled+ran in {c:.0f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            up(grid)
            best = min(best, time.perf_counter() - t0)
        return best, up

    (w1, _), (w2, up) = wall(n1), wall(n2)
    cells = grid.shape[0] * grid.shape[1]
    return cells * (n2 - n1) / (w2 - w1) / 1e9, up

if app == "hotspot":
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

    def make(n):
        return create_update(
            Params(transition_function=kernel, halo_value=halo,
                   n_iterations=n, blocking=True),
            backend="tiling", **base, **extra)
else:
    from stencilstream_tpu.models import fdtd
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
    base = dict(fdtd.TUNED.get("tiling", {}))

    def make(n):
        update, _ = fdtd.build_simulation(
            params, resolver=resolver, backend="tiling", n_iterations=n,
            tdv_strategy="inline", **base, **extra)
        return update

rate, up = marginal(grid, make)
mode = (getattr(up, "resolved_config", None) or {}).get("window_mode", "?")
print(f"[{app}] {label} (resolved={mode}): {rate:.2f} GCell/s marginal",
      flush=True)
"""

ARMS = [
    # (app, label, extra kwargs as python literal, timeout_s)
    ("hotspot", "pad+concat", "{}", 1800),
    ("hotspot", "linecache", "{'window_mode': 'linecache'}", 2400),
    ("fdtd", "pad+concat", "{}", 1800),
    ("fdtd", "linecache", "{'window_mode': 'linecache'}", 2400),
    ("hotspot", "pad+roll", "{'shift_impl': 'roll'}", 2400),
    ("fdtd", "pad+roll", "{'shift_impl': 'roll'}", 2400),
]


def main():
    skip_roll = "--skip-roll" in sys.argv
    for app, label, extra, tmo in ARMS:
        if skip_roll and "roll" in label:
            continue
        print(f"--- arm {app}/{label} (timeout {tmo}s)", flush=True)
        try:
            subprocess.run([sys.executable, "-u", "-c", ARM, app, label,
                            extra], timeout=tmo, check=False)
        except subprocess.TimeoutExpired:
            print(f"[{app}] {label}: TIMEOUT after {tmo}s", flush=True)


if __name__ == "__main__":
    main()
