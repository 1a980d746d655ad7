"""Transposed execution: run any transition function on the transposed grid.

The single-chip tiling backend decomposes along rows (full-width strips,
see :mod:`.tiling`). A wide-and-short grid (e.g. 64 x 1e6) has too few rows
to strip — the reference handles such shapes with its 2D tile calculus
(``tiling/Grid.hpp:305-424``); the TPU-native equivalent is to decompose
along whichever axis is longer by running on the TRANSPOSED layout. Because
every kernel access goes through the :class:`~..core.stencil.Stencil` view,
transposition is transparent: a wrapper swaps neighbor offsets, coordinates
and the grid range, so user transition functions observe exactly the
original geometry.
"""

from __future__ import annotations

import jax

from ..core.stencil import Stencil

__all__ = ["TransposedKernel", "transpose_arrays"]


def transpose_arrays(arrays):
    return jax.tree.map(lambda a: a.T, arrays)


class _TransposedStencil:
    """Presents a transposed window as the original orientation."""

    __slots__ = ("_s",)

    def __init__(self, s: Stencil):
        self._s = s

    def __getitem__(self, key):
        dr, dc = key
        return self._s[dc, dr]

    def uid(self, ur, uc):
        r = self._s.radius
        return self[ur - r, uc - r]

    @property
    def center(self):
        return self._s[0, 0]

    @property
    def radius(self):
        return self._s.radius

    @property
    def diameter(self):
        return self._s.diameter

    @property
    def id(self):
        return (self._s.id[1], self._s.id[0])

    @property
    def row(self):
        return self._s.id[1]

    @property
    def col(self):
        return self._s.id[0]

    @property
    def grid_range(self):
        h, w = self._s.grid_range
        return (w, h)

    @property
    def iteration(self):
        return self._s.iteration

    @property
    def subiteration(self):
        return self._s.subiteration

    @property
    def time_dependent_value(self):
        return self._s.time_dependent_value

    tdv = time_dependent_value

    def on_boundary(self):
        h, w = self.grid_range
        return (
            (self.row == 0)
            | (self.row == h - 1)
            | (self.col == 0)
            | (self.col == w - 1)
        )


@jax.tree_util.register_pytree_node_class
class TransposedKernel:
    """Wraps a transition function so it runs correctly on transposed
    storage. Inherits radius/sub-iteration counts; TDV passes through."""

    def __init__(self, tf):
        self.tf = tf

    @property
    def stencil_radius(self):
        return self.tf.stencil_radius

    @property
    def n_subiterations(self):
        return self.tf.n_subiterations

    def get_time_dependent_value(self, i):
        return self.tf.get_time_dependent_value(i)

    def __call__(self, s):
        return self.tf(_TransposedStencil(s))

    def tree_flatten(self):
        return (self.tf,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.tf = children[0]
        return obj
