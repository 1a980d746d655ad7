"""Common StencilUpdate machinery shared by all backends.

Implements the updater contract from ``StencilStream/Concepts.hpp:131-172``:
construction from a ``Params`` struct, ``get_params()`` returning a live
reference whose mutations apply to the next call, a pure
``update(grid) -> grid`` call operator, and the accumulated
``n_processed_cells`` / ``walltime`` counters every reference backend keeps
(``cpu/StencilUpdate.hpp:138-139,152-166``).
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp

from ..core.cell import cell_dtypes, cell_zeros
from ..core.grid import Grid
from ..core.params import Params
from ..core.transition import validate_transition_function
from ..tdv import resolve_tdv_strategy

__all__ = ["StencilUpdateBase", "resolve_halo"]


def resolve_halo(halo_value: Any, grid: Grid) -> Any:
    """Resolve ``Params.halo_value`` to a scalar cell pytree matching the
    grid's structure and dtypes (default: zero cell, the analog of
    ``TF::Cell()`` in ``Concepts.hpp:144``)."""
    if halo_value is None:
        return cell_zeros(grid.arrays)
    halo_def = jax.tree.structure(halo_value)
    grid_def = jax.tree.structure(grid.arrays)
    if halo_def != grid_def:
        raise TypeError(
            f"halo_value structure {halo_def} does not match the grid's cell "
            f"structure {grid_def}"
        )
    return jax.tree.map(
        lambda h, d: jnp.asarray(h, dtype=d), halo_value, cell_dtypes(grid.arrays)
    )


def _is_toolchain_failure(e: Exception) -> bool:
    """True if ``e`` came out of the JAX/XLA/Mosaic toolchain rather than
    framework validation or user transition-function code.

    Classified by (a) the exception type living in a jax/jaxlib module
    (``XlaRuntimeError``, Mosaic lowering errors, ...), or (b) a bare
    ``RuntimeError``/``NotImplementedError`` whose raising frame is inside
    jax — Mosaic lowering raises builtins for unsupported ops. A
    ``RuntimeError`` raised from user code is NOT a toolchain failure and
    propagates (ADVICE.md round 1: the broad match masked user bugs).
    """
    mod = type(e).__module__ or ""
    if mod.startswith(("jax", "jaxlib")):
        return True
    if type(e).__name__ in ("XlaRuntimeError", "JaxRuntimeError", "MosaicError"):
        return True
    if isinstance(e, (RuntimeError, NotImplementedError)):
        tb = e.__traceback__
        frames = []
        while tb is not None:
            frames.append(tb.tb_frame.f_globals.get("__name__", ""))
            tb = tb.tb_next
        # The *raising* (innermost) frame decides: toolchain errors originate
        # inside jax/jaxlib even when user code sits above them on the stack.
        return bool(frames) and frames[-1].startswith(("jax", "jaxlib"))
    return False


class StencilUpdateBase:
    """Base class for all stencil updaters.

    ``fallback_to_reference`` (default True for accelerated backends):
    if the backend's compiled path fails (e.g. a toolchain defect on some
    kernel shape), the update transparently re-runs through the pure-XLA
    reference backend and keeps using it, with a one-time warning — every
    transition function always *runs*, accelerated or not.
    """

    Params = Params
    #: overridden by accelerated backends
    _can_fallback = False

    def __init__(self, params: Params):
        if isinstance(params, dict):
            params = self.Params(**params)
        validate_transition_function(params.transition_function)
        self.params = params
        self._n_processed_cells = 0
        self._walltime = 0.0
        self.fallback_to_reference = self._can_fallback
        self._fallback = None

    # -- the updater contract ------------------------------------------------
    def get_params(self) -> Params:
        """Live parameter reference; changed fields apply to the next call
        (``Concepts.hpp:152-153``)."""
        return self.params

    def __call__(self, grid: Grid) -> Grid:
        """Compute ``n_iterations`` logical iterations and return the new
        grid. The input grid is never modified (functional updates)."""
        if not isinstance(grid, Grid):
            grid = Grid(grid)
        p = self.params
        start = time.perf_counter()
        if self._fallback is not None:
            self._fallback.params = self.params
            out = self._fallback._update(grid)
        else:
            try:
                out = self._update(grid)
                if p.blocking:
                    out.block_until_ready()
            except Exception as e:  # pragma: no cover - toolchain-dependent
                # Framework validation errors (capacity checks, bad configs)
                # and errors raised from *user* transition-function code are
                # intentional and re-raised; only toolchain (JAX/XLA/Mosaic)
                # failures fall back (advisor finding, ADVICE.md round 1).
                if not (self.fallback_to_reference and _is_toolchain_failure(e)):
                    raise
                import warnings

                from . import reference

                warnings.warn(
                    f"{type(self).__module__.rsplit('.', 1)[-1]} backend failed to "
                    f"compile/run ({type(e).__name__}); falling back to the "
                    f"reference backend for this updater. Original error: "
                    f"{str(e).splitlines()[0][:200]}"
                )
                self._fallback = reference.StencilUpdate(self.params)
                out = self._fallback._update(grid)
        if p.blocking:
            out.block_until_ready()
        self._walltime += time.perf_counter() - start
        self._n_processed_cells += int(p.n_iterations) * grid.height * grid.width
        return out

    # -- metrics (``cpu/StencilUpdate.hpp:152-166``) -------------------------
    def get_n_processed_cells(self) -> int:
        return self._n_processed_cells

    def get_walltime(self) -> float:
        return self._walltime

    # -- backend hook --------------------------------------------------------
    def _update(self, grid: Grid) -> Grid:
        raise NotImplementedError

    # -- shared helpers ------------------------------------------------------
    def _tdv_strategy(self):
        return resolve_tdv_strategy(self.params.tdv_strategy)

    @property
    def transition_function(self):
        return self.params.transition_function
