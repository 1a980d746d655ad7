"""Transposed execution for wide-and-short grids (tiling backend).

The TPU-native restatement of the reference's 2D tile calculus
(``tiling/Grid.hpp:305-424``): a grid with too few rows to strip-decompose
runs on the transposed layout, with the Stencil view swapping offsets and
coordinates so transition functions observe the original geometry.
"""

import numpy as np

from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import tiling

from probe import ProbeTransFunc, check_probe_grid, make_probe_grid, probe_halo_cell


def test_probe_contract_on_wide_short_grid():
    """64 x 512: rows < 128 <= cols triggers transposed execution; the probe
    checks every coordinate/iteration/halo property from inside the kernel,
    so a wrong swap anywhere fails loudly."""
    up = tiling.StencilUpdate(
        Params(
            transition_function=ProbeTransFunc(),
            halo_value=probe_halo_cell(),
            iteration_offset=1,
            n_iterations=3,
        ),
        strip_rows=64,
        iters_per_pass=2,
    )
    up.fallback_to_reference = False
    check_probe_grid(up(make_probe_grid(64, 512, iteration_offset=1)), 4)


def test_wide_short_matches_oracle_hotspot():
    from stencilstream_tpu.backends import create_update
    from stencilstream_tpu.models.hotspot import HotspotCell, derive_coefficients
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    h, w = 48, 640
    grid = Grid.from_numpy(
        HotspotCell(
            temp=rng.uniform(70, 90, (h, w)).astype(np.float32),
            power=rng.uniform(0, 1e-3, (h, w)).astype(np.float32),
        )
    )
    kernel = derive_coefficients(h, w)
    halo = HotspotCell(temp=jnp.float32(0), power=jnp.float32(0))
    up = tiling.StencilUpdate(
        Params(transition_function=kernel, halo_value=halo, n_iterations=6),
        strip_rows=128,
        iters_per_pass=4,
    )
    up.fallback_to_reference = False
    out = up(grid)
    ref = create_update(
        Params(transition_function=kernel, halo_value=halo, n_iterations=6),
        backend="reference",
    )(grid)
    np.testing.assert_allclose(
        out.to_numpy().temp, ref.to_numpy().temp, rtol=2e-6, atol=1e-5
    )
