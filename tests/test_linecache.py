"""Line-cache strip kernel (``window_mode="linecache"``): bit-exactness vs
the reference oracle across the app families, the probe contract, and the
eligibility fallback.

The line-cache path is the TPU analog of the reference monotile kernel's
2-bank line cache (``monotile/internal/StencilUpdateKernel.hpp:180-186``)
applied to the strip decomposition: sequential strips carry their overlap
rows in VMEM scratch, so halo rows are neither re-read from HBM nor
re-computed; grid-edge rows are recomputed by a small extended-mode band
pass and patched (``backends/line_cache.py``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import create_update
from stencilstream_tpu.models import jacobi

from probe import ProbeTransFunc, check_probe_grid, make_probe_grid, probe_halo_cell


def _linecache_update(params, **kw):
    up = create_update(params, backend="tiling", window_mode="linecache", **kw)
    up.fallback_to_reference = False
    return up


def _assert_tree_equal(a, b, context=""):
    errs = jax.tree.map(
        lambda x, y: float(
            np.abs(
                np.asarray(x, np.float32) - np.asarray(y, np.float32)
            ).max()
        ),
        a,
        b,
    )
    assert max(jax.tree.leaves(errs)) == 0.0, (context, errs)


COEFS = [0.15, 0.2, 0.25, 0.1, 0.3]


@pytest.mark.parametrize(
    "n,p,T,shift_impl",
    [(8, 4, 16, "concat"), (5, 4, 16, "concat"), (12, 2, 24, "roll")],
    ids=["full", "partial", "roll"],
)
def test_jacobi_bit_exact(n, p, T, shift_impl):
    """Bit-exact against the same-lowering baseline: the reference oracle
    for concat; the production clamped strip path for roll (the roll
    lowering itself reassociates FMAs by 1 ulp vs concat under XLA:CPU —
    a pre-existing lowering property, so the linecache claim is exactness
    *relative to the production path with the same lowering*)."""
    rng = np.random.default_rng(0)
    grid = Grid.from_numpy(rng.random((96, 128), np.float32))
    kernel = jacobi.make_kernel("jacobi5_general", COEFS)
    params = Params(transition_function=kernel, n_iterations=n, blocking=True)
    if shift_impl == "concat":
        base = create_update(params, backend="reference")(grid)
    else:
        base_up = create_update(
            params, backend="tiling", strip_rows=T, iters_per_pass=p,
            shift_impl=shift_impl,
        )
        base_up.fallback_to_reference = False
        base = base_up(grid)
    out = _linecache_update(
        params, strip_rows=T, iters_per_pass=p, shift_impl=shift_impl
    )(grid)
    _assert_tree_equal(base.arrays, out.arrays, f"jacobi n={n} p={p}")


@pytest.mark.parametrize(
    "tdv", ["inline", "precompute_on_host", "precompute_on_device"]
)
def test_probe_contract(tdv):
    """The self-verifying probe (halo handling, iteration/sub-iteration
    counting, TDV plumbing, cell positions) on a lane-aligned grid, with an
    iteration offset and a partial final pass."""
    up = _linecache_update(
        Params(
            transition_function=ProbeTransFunc(),
            halo_value=probe_halo_cell(),
            iteration_offset=2,
            n_iterations=3,
            tdv_strategy=tdv,
        ),
        strip_rows=8,
        iters_per_pass=2,
    )
    out = up(make_probe_grid(24, 128, iteration_offset=2))
    check_probe_grid(out, 5)


def test_hotspot_invariant_and_boundary():
    """handles_boundary kernel with an invariant field (the power map):
    the line-cache pass must clamp via global coordinates and reuse the
    input array for the elided field."""
    from stencilstream_tpu.models.hotspot import HotspotCell, derive_coefficients

    rng = np.random.default_rng(1)
    H, W = 80, 128
    grid = Grid.from_numpy(
        HotspotCell(
            temp=rng.uniform(70, 90, (H, W)).astype(np.float32),
            power=rng.uniform(0, 1e-3, (H, W)).astype(np.float32),
        )
    )
    halo = HotspotCell(temp=jnp.float32(0.0), power=jnp.float32(0.0))
    for n in (8, 6):  # full and partial passes
        params = Params(
            transition_function=derive_coefficients(H, W),
            halo_value=halo,
            n_iterations=n,
            blocking=True,
        )
        ref = create_update(params, backend="reference")(grid)
        out = _linecache_update(params, strip_rows=16, iters_per_pass=4)(grid)
        _assert_tree_equal(ref.arrays, out.arrays, f"hotspot n={n}")


def test_fdtd_subiterations_tdv():
    """k=2 sub-iterations + the inline TDV source wave."""
    from stencilstream_tpu.models import fdtd

    p = fdtd.Parameters.from_json(
        {
            "tau": 100e-15,
            "dx": 1.5655577299412914e-9,
            "time": {"t_cutoff": 7.0, "t_detect": 14.0, "t_max": 15.0},
            "source": {"frequency": 120e12, "phase": 3.0, "x": 20, "y": 20, "radius": 4},
            "cavity_rings": [
                {"radius": 8e-9, "mu_r": 11.56, "eps_r": 1.0, "sigma": 0.0}
            ],
        }
    )
    resolver = fdtd.CoefResolver(p)
    grid = Grid(jax.tree.map(lambda a: a[:64, :128], fdtd.init_grid(p, resolver).arrays))
    params = Params(
        transition_function=fdtd.make_kernel(p, resolver),
        halo_value=resolver.halo_cell(),
        n_iterations=6,
        blocking=True,
    )
    ref = create_update(params, backend="reference")(grid)
    out = _linecache_update(params, strip_rows=16, iters_per_pass=2)(grid)
    _assert_tree_equal(ref.arrays, out.arrays, "fdtd")


def test_convection_folded_k3():
    """The folded convection kernel variant: k=3, handles_boundary,
    bool coefficient planes among the invariant fields."""
    from stencilstream_tpu.models import convection

    e = convection.Experiment(
        lx=3.0, ly=1.0, px=1.5, py=0.5, eta0=1.0, DcT=1.0, deltaT=1.0,
        Ra=1e7, Pra=1e3, res=32, iterMax=100, nt=2, nout=1,
        nerr=10, epsilon=1e-4, dmp=2.0,
    )
    grid = convection.init_folded_grid(e)
    params = Params(
        transition_function=convection.make_folded_pseudo_transient_kernel(e),
        halo_value=convection.folded_zero_cell(),
        n_iterations=4,
        blocking=True,
    )
    ref = create_update(params, backend="reference")(grid)
    out = _linecache_update(params, strip_rows=24, iters_per_pass=2)(grid)
    # XLA:CPU contracts the folded kernel's FMA chains differently for the
    # line-cache tap graph (slice-of-concat) than for the oracle's shifted
    # windows — a few-ulp drift on a handful of cells (relmax <= 4.4e-7
    # measured), same class as the roll-lowering note above. On hardware the
    # interior is bit-exact (experiments/micro_linecache.py --check).
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-6,
        ),
        ref.arrays,
        out.arrays,
    )


def test_conway_bool_cells():
    """bool cells (int8 store encoding in window, carry scratch, output)."""
    from stencilstream_tpu.models.conway import ConwayKernel

    g = np.zeros((16, 128), bool)
    g[3, 2:5] = True  # horizontal blinker
    up = _linecache_update(
        Params(
            transition_function=ConwayKernel(),
            halo_value=jnp.asarray(False),
            n_iterations=2,
            blocking=True,
        ),
        strip_rows=8,
        iters_per_pass=2,
    )
    out = up(Grid.from_numpy(g)).to_numpy()
    np.testing.assert_array_equal(out, g)


def test_ineligible_grids_fall_back_to_clamped():
    """Non-lane-aligned widths (and too-short grids) take the clamped
    window path — results stay correct either way."""
    rng = np.random.default_rng(2)
    grid = Grid.from_numpy(rng.random((24, 40), np.float32))
    kernel = jacobi.make_kernel("jacobi5_general", COEFS)
    params = Params(transition_function=kernel, n_iterations=4, blocking=True)
    ref = create_update(params, backend="reference")(grid)
    out = _linecache_update(params, strip_rows=8, iters_per_pass=2)(grid)
    _assert_tree_equal(ref.arrays, out.arrays, "fallback")


def test_resume_equivalence():
    """iteration_offset splitting across calls matches one combined run
    through the line-cache path (checkpoint/resume contract)."""
    rng = np.random.default_rng(3)
    grid = Grid.from_numpy(rng.random((48, 128), np.float32))
    kernel = jacobi.make_kernel("jacobi5_general", COEFS)

    combined = _linecache_update(
        Params(transition_function=kernel, n_iterations=6, blocking=True),
        strip_rows=16,
        iters_per_pass=4,
    )(grid)

    first = _linecache_update(
        Params(transition_function=kernel, n_iterations=3, blocking=True),
        strip_rows=16,
        iters_per_pass=4,
    )(grid)
    second = _linecache_update(
        Params(
            transition_function=kernel,
            n_iterations=3,
            iteration_offset=3,
            blocking=True,
        ),
        strip_rows=16,
        iters_per_pass=4,
    )(first)
    _assert_tree_equal(combined.arrays, second.arrays, "resume")
