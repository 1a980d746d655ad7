"""Compile-failure fallback: accelerated backends must transparently re-run
through the reference oracle when their compiled path fails."""

import numpy as np
import pytest

from stencilstream_tpu.core import Params
from stencilstream_tpu.backends import monotile
from stencilstream_tpu.models import jacobi


def make_update(**kw):
    kernel = jacobi.make_kernel("jacobi1_general", [0.5])
    return monotile.StencilUpdate(
        Params(transition_function=kernel, n_iterations=2), **kw
    )


def test_fallback_produces_reference_result(monkeypatch):
    up = make_update()
    monkeypatch.setattr(
        monotile.StencilUpdate,
        "_update",
        lambda self, grid: (_ for _ in ()).throw(RuntimeError("simulated Mosaic crash")),
    )
    grid = jacobi.init_grid(8, 8)
    with pytest.warns(UserWarning, match="falling back to the reference backend"):
        out = up(grid)
    np.testing.assert_allclose(out.to_numpy(), grid.to_numpy() * 0.25)

    # Subsequent calls use the fallback silently and track param mutations.
    up.get_params().transition_function.coef = 1.0
    out2 = up(grid)
    np.testing.assert_allclose(out2.to_numpy(), grid.to_numpy())


def test_validation_errors_still_raise():
    up = make_update()
    big = jacobi.init_grid(8192, 8192)
    with pytest.raises(ValueError, match="tiling backend"):
        up(big)


def test_fallback_can_be_disabled(monkeypatch):
    up = make_update()
    up.fallback_to_reference = False
    monkeypatch.setattr(
        monotile.StencilUpdate,
        "_update",
        lambda self, grid: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    with pytest.raises(RuntimeError, match="boom"):
        up(jacobi.init_grid(8, 8))
