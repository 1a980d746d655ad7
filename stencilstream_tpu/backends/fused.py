"""Fused multi-iteration window updates (temporal blocking building block).

This is the TPU-native replacement for the reference's processing-element
chain (``StencilStream/monotile/internal/StencilUpdateKernel.hpp:65``,
``tiling/internal/StencilUpdateKernel.hpp:59``): where the FPGA unrolls
``p * n_subiterations`` PEs in silicon and streams cells through them, we
unroll the same number of *whole-window* sub-iteration steps in the program,
keeping the window in VMEM/registers between steps.

Per-axis window disciplines, matching the two reference kernels:

* ``"pad"`` — the window spans the whole grid along this axis, so the window
  edge *is* the grid edge: neighbors beyond it are the halo value, injected
  by constant padding each sub-step (monotile semantics — the grid boundary
  is the halo boundary, ``monotile/internal/StencilUpdateKernel.hpp:36-38``).
* ``"shrink"`` — overlapped-tiling discipline: the window loses ``radius``
  cells per side per sub-step, so a window of
  ``core + 2 * radius * p * n_subiterations`` yields the core after ``p``
  fused iterations — the exact compound-halo law of the reference's tiling
  backend (``tiling/internal/StencilUpdateKernel.hpp:79-91``).

Independent of discipline, out-of-grid window cells are re-masked to the halo
value after every sub-step — the vectorized equivalent of the reference's
per-PE coordinate-based halo masking
(``monotile/internal/StencilUpdateKernel.hpp:259-303``) — and cells whose
iteration index is past the requested target pass through unchanged, the
reference's partial-pass pass-through (:250-256).

Everything here is plain ``jnp``, so it traces equally well inside a Pallas
kernel (tiling backend) and inside ``shard_map`` (distributed backend).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..core.cell import canonicalize_cell
from ..core.stencil import Stencil

__all__ = ["fused_window_pass", "halo_width"]


def halo_width(radius: int, iters_per_pass: int, n_subiterations: int) -> int:
    """Window halo per side for a fused pass — the reference's compound-halo
    law ``r * p * n_subiterations`` (``tiling/StencilUpdate.hpp:81-87``)."""
    return radius * iters_per_pass * n_subiterations


def _pad_axis(window: Any, halo_cell: Any, r: int, axis: int) -> Any:
    """Concatenate ``r`` halo-valued rows/columns on both ends of ``axis``."""

    def pad_leaf(a, hv):
        shape = list(a.shape)
        shape[axis] = r
        frame = jnp.full(shape, jnp.asarray(hv, a.dtype))
        return jnp.concatenate([frame, a, frame], axis=axis)

    return jax.tree.map(pad_leaf, window, halo_cell)


def fused_window_pass(
    window: Any,
    tf: Any,
    halo_cell: Any,
    origin: tuple[Any, Any],
    grid_range: tuple[Any, Any],
    i_start: Any,
    i_target: Any,
    tdv_lookup: Callable[[Any, Any], Any],
    *,
    radius: int,
    n_subiterations: int,
    n_steps: int,
    row_mode: str = "shrink",
    col_mode: str = "pad",
) -> Any:
    """Apply ``n_steps`` fused iterations to a window of cells.

    Args:
      window: cell pytree of ``(h, w)`` arrays. A ``"shrink"`` axis must
        exceed ``2 * radius * n_steps * n_subiterations``.
      origin: global (row, col) of ``window[0, 0]`` (traced values ok).
      grid_range: logical grid extent ``(H, W)`` for halo masking and
        ``stencil.grid_range`` (traced values ok when modes permit).
      i_start: absolute iteration index of the first fused step.
      i_target: absolute end iteration; steps at/after it pass cells through
        unchanged (partial-pass support, enables fixed-shape pass loops).
      tdv_lookup: ``(step, i_abs) -> tdv``, traced per fused step; ``step``
        counts fused steps within this pass.
      row_mode / col_mode: ``"shrink"`` or ``"pad"`` (see module docstring).

    Returns the final window pytree; each ``"shrink"`` axis is smaller by
    ``2 * radius * n_steps * n_subiterations`` and its origin advanced by
    half that.
    """
    r = radius
    H, W = grid_range
    row0 = jnp.asarray(origin[0], jnp.int32)
    col0 = jnp.asarray(origin[1], jnp.int32)

    # Pre-mask: out-of-grid window positions must present the halo value at
    # the first sub-step too (mesh-edge ppermute halos arrive as zeros; the
    # reference substitutes at insertion time,
    # ``tiling/internal/HaloTiledInputKernel.hpp:66-107``).
    h0, w0 = jax.tree.leaves(window)[0].shape
    row_in = lax.broadcasted_iota(jnp.int32, (h0, w0), 0) + row0
    col_in = lax.broadcasted_iota(jnp.int32, (h0, w0), 1) + col0
    oog_in = (row_in < 0) | (row_in >= H) | (col_in < 0) | (col_in >= W)
    window = jax.tree.map(
        lambda a, hv: jnp.where(oog_in, jnp.asarray(hv, a.dtype), a),
        window,
        halo_cell,
    )

    for step in range(n_steps):
        i_abs = i_start + step
        tdv = tdv_lookup(step, i_abs)
        active = i_abs < i_target
        for sub in range(n_subiterations):
            h, w = jax.tree.leaves(window)[0].shape
            src = window
            # Along "pad" axes the slice origin shifts by r into the padding;
            # along "shrink" axes it stays and the output loses 2r cells.
            if row_mode == "pad":
                src = _pad_axis(src, halo_cell, r, 0)
                nh = h
            else:
                nh = h - 2 * r
                row0 = row0 + r
            if col_mode == "pad":
                src = _pad_axis(src, halo_cell, r, 1)
                nw = w
            else:
                nw = w - 2 * r
                col0 = col0 + r

            def neighbor(dr: int, dc: int, _src=src, _nh=nh, _nw=nw):
                return jax.tree.map(
                    lambda a: lax.slice(
                        a, (r + dr, r + dc), (r + dr + _nh, r + dc + _nw)
                    ),
                    _src,
                )

            row = lax.broadcasted_iota(jnp.int32, (nh, nw), 0) + row0
            col = lax.broadcasted_iota(jnp.int32, (nh, nw), 1) + col0

            stencil = Stencil(
                neighbor_fn=neighbor,
                radius=r,
                id=(row, col),
                grid_range=grid_range,
                iteration=i_abs,
                subiteration=sub,
                time_dependent_value=tdv,
            )
            center = stencil[0, 0]
            new = canonicalize_cell(tf(stencil), center)
            # Partial-pass pass-through (scalar predicate, vectorized select).
            new = jax.tree.map(lambda n, c: jnp.where(active, n, c), new, center)
            # Halo re-mask: out-of-grid positions always present halo_value.
            out_of_grid = (row < 0) | (row >= H) | (col < 0) | (col >= W)
            window = jax.tree.map(
                lambda n, hv: jnp.where(out_of_grid, jnp.asarray(hv, n.dtype), n),
                new,
                halo_cell,
            )
    return window
