"""Compile-failure fallback: accelerated backends must transparently re-run
through the reference oracle when their compiled path fails — but ONLY for
toolchain (JAX/XLA/Mosaic) failures. Errors raised from user transition
functions or framework validation propagate (ADVICE.md round 1: the broad
RuntimeError match masked user bugs)."""

import numpy as np
import pytest

from stencilstream_tpu.core import Params
from stencilstream_tpu.backends import monotile
from stencilstream_tpu.backends.base import _is_toolchain_failure
from stencilstream_tpu.models import jacobi


def make_update(**kw):
    kernel = jacobi.make_kernel("jacobi1_general", [0.5])
    return monotile.StencilUpdate(
        Params(transition_function=kernel, n_iterations=2), **kw
    )


def _simulated_mosaic_crash(self, grid):
    """Raise the way the toolchain does: a JaxRuntimeError (jax.errors)."""
    import jax.errors

    raise jax.errors.JaxRuntimeError("INTERNAL: Mosaic failed to compile TPU kernel")


def test_fallback_produces_reference_result(monkeypatch):
    up = make_update()
    monkeypatch.setattr(monotile.StencilUpdate, "_update", _simulated_mosaic_crash)
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


def test_user_runtime_errors_propagate():
    """A RuntimeError raised by *user* transition-function code must NOT be
    swallowed by the fallback net (advisor finding)."""

    from stencilstream_tpu.core import transition_function

    @transition_function
    class ExplodingKernel:
        stencil_radius = 1
        n_subiterations = 1

        def __call__(self, s):
            raise RuntimeError("user bug, not a compiler failure")

        def get_time_dependent_value(self, i):
            return None

    up = monotile.StencilUpdate(
        Params(transition_function=ExplodingKernel(), n_iterations=1)
    )
    assert up.fallback_to_reference
    with pytest.raises(RuntimeError, match="user bug"):
        up(jacobi.init_grid(8, 8))


def test_toolchain_failure_classifier():
    # User-code errors: not toolchain.
    try:
        raise RuntimeError("user bug")
    except RuntimeError as e:
        assert not _is_toolchain_failure(e)
    try:
        raise NotImplementedError("user abstract method")
    except NotImplementedError as e:
        assert not _is_toolchain_failure(e)
    # jax/jaxlib exception types: toolchain.
    import jax.errors

    try:
        raise jax.errors.JaxRuntimeError("INTERNAL: Mosaic failure")
    except Exception as e:
        assert _is_toolchain_failure(e)


def test_fallback_can_be_disabled(monkeypatch):
    up = make_update()
    up.fallback_to_reference = False
    monkeypatch.setattr(monotile.StencilUpdate, "_update", _simulated_mosaic_crash)
    with pytest.raises(Exception, match="Mosaic failed"):
        up(jacobi.init_grid(8, 8))
