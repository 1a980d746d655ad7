"""Persistent checkpoint round-trips + resumed-simulation equivalence."""

import numpy as np

from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import create_update
from stencilstream_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from stencilstream_tpu.models import jacobi
from stencilstream_tpu.models.hotspot import HotspotCell


def test_roundtrip_multifield(tmp_path):
    rng = np.random.default_rng(0)
    g = Grid.from_numpy(
        HotspotCell(
            temp=rng.normal(size=(9, 7)).astype(np.float32),
            power=rng.normal(size=(9, 7)).astype(np.float32),
        )
    )
    p = tmp_path / "ck.npz"
    save_checkpoint(str(p), g, iteration=17)
    g2, it = load_checkpoint(str(p), like=g)
    assert it == 17
    np.testing.assert_array_equal(g2.to_numpy().temp, g.to_numpy().temp)
    np.testing.assert_array_equal(g2.to_numpy().power, g.to_numpy().power)


def test_resume_across_processes_equivalent(tmp_path):
    """save at i, reload, continue == one uninterrupted run."""
    kernel = jacobi.make_kernel("jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3])
    grid = jacobi.init_grid(12, 12)

    up = create_update(Params(transition_function=kernel, n_iterations=6))
    full = up(grid).to_numpy()

    up1 = create_update(Params(transition_function=kernel, n_iterations=3))
    mid = up1(grid)
    p = tmp_path / "ck.npz"
    save_checkpoint(str(p), mid, iteration=3)

    restored, it = load_checkpoint(str(p), like=grid)
    up2 = create_update(
        Params(transition_function=kernel, iteration_offset=it, n_iterations=3)
    )
    np.testing.assert_allclose(up2(restored).to_numpy(), full, rtol=1e-6)
