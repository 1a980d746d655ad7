"""Unit tests for the value types: Stencil view, Grid, cells, params.

Mirrors the reference's pure-host unit tests (``tests/Stencil.cpp:27-50``,
``tests/GridTest.hpp:25-123``) including the deliberately non-power-of-two
129x65 grid geometry.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stencilstream_tpu import Grid, Stencil, cell_type, transition_function
from stencilstream_tpu.core.cell import cell_block_shape, cell_zeros
from stencilstream_tpu.core.transition import validate_transition_function
from stencilstream_tpu.backends.base import resolve_halo


@cell_type
class TwoField:
    a: jnp.ndarray
    b: jnp.ndarray


def make_stencil(radius=1, shape=(4, 5)):
    h, w = shape

    def neighbor(dr, dc):
        # Encode the offset so tests can see which neighbor was returned.
        return jnp.full(shape, 10 * dr + dc, jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return Stencil(
        neighbor_fn=neighbor,
        radius=radius,
        id=(rows, cols),
        grid_range=shape,
        iteration=jnp.int32(3),
        subiteration=1,
        time_dependent_value=jnp.float32(2.5),
    )


class TestStencil:
    def test_signed_indexing(self):
        st = make_stencil(radius=2)
        assert int(st[-2, 1][0, 0]) == -19
        assert int(st[0, 0][0, 0]) == 0
        assert int(st[2, -2][0, 0]) == 18

    def test_unsigned_indexing_origin_nw(self):
        # UID (0,0) is the north-western corner (Stencil.hpp:148-162).
        st = make_stencil(radius=1)
        assert int(st.uid(0, 0)[0, 0]) == -11
        assert int(st.uid(1, 1)[0, 0]) == 0
        assert int(st.uid(2, 2)[0, 0]) == 11

    def test_diameter(self):
        assert make_stencil(radius=3).diameter == 7

    def test_out_of_range_raises(self):
        st = make_stencil(radius=1)
        with pytest.raises(IndexError):
            st[2, 0]
        with pytest.raises(IndexError):
            st[0, -2]

    def test_metadata(self):
        st = make_stencil()
        assert int(st.iteration) == 3
        assert st.subiteration == 1
        assert st.grid_range == (4, 5)
        assert float(st.tdv) == 2.5
        assert int(st.id[0][2, 3]) == 2 and int(st.id[1][2, 3]) == 3

    def test_neighbor_caching(self):
        calls = []

        def neighbor(dr, dc):
            calls.append((dr, dc))
            return jnp.zeros((2, 2))

        st = Stencil(neighbor, 1, (0, 0), (2, 2), 0, 0)
        st[1, 0]
        st[1, 0]
        assert calls == [(1, 0)]

    def test_on_boundary(self):
        st = make_stencil(radius=1, shape=(3, 4))
        mask = np.asarray(st.on_boundary())
        assert mask.all(axis=None) == False or True  # shape check below
        interior = mask[1:-1, 1:-1]
        assert not interior.any()
        assert mask[0].all() and mask[-1].all() and mask[:, 0].all() and mask[:, -1].all()


class TestGrid:
    def test_full_and_geometry_non_power_of_two(self):
        # 129x65, as in tests/tiling/Grid.cpp:36-51.
        g = Grid.full(129, 65, TwoField(a=jnp.float32(1.5), b=jnp.int32(7)))
        assert g.height == 129 and g.width == 65
        assert g.range == (129, 65)
        assert g.arrays.a.dtype == jnp.float32
        assert g.arrays.b.dtype == jnp.int32
        cell = g.cell_at(128, 64)
        assert float(cell.a) == 1.5 and int(cell.b) == 7

    def test_make_similar_zeroes(self):
        g = Grid.full(4, 4, jnp.float32(3.0))
        s = g.make_similar()
        assert s.shape == (4, 4)
        np.testing.assert_array_equal(np.asarray(s.arrays), 0.0)

    def test_from_to_numpy_roundtrip(self):
        a = np.arange(12, dtype=np.float32).reshape(3, 4)
        g = Grid.from_numpy(TwoField(a=a, b=a.astype(np.int32)))
        out = g.to_numpy()
        np.testing.assert_array_equal(out.a, a)
        np.testing.assert_array_equal(out.b, a.astype(np.int32))

    def test_mismatched_field_shapes_raise(self):
        with pytest.raises(ValueError):
            Grid.from_numpy(TwoField(a=np.zeros((3, 4)), b=np.zeros((4, 3))))

    def test_grid_is_pytree(self):
        g = Grid.full(2, 3, jnp.float32(1.0))
        doubled = jax.jit(lambda gr: jax.tree.map(lambda x: 2 * x, gr))(g)
        assert isinstance(doubled, Grid)
        np.testing.assert_array_equal(np.asarray(doubled.arrays), 2.0)

    def test_set_cell(self):
        g = Grid.full(3, 3, jnp.float32(0.0)).set_cell(1, 2, jnp.float32(9.0))
        assert float(g.cell_at(1, 2)) == 9.0
        assert float(g.cell_at(0, 0)) == 0.0


class TestTransitionFunctionContract:
    def test_validation_errors(self):
        class NoRadius:
            n_subiterations = 1

            def __call__(self, s):
                return s[0, 0]

            def get_time_dependent_value(self, i):
                return None

        with pytest.raises(TypeError, match="stencil_radius"):
            validate_transition_function(NoRadius())

        class BadSub:
            stencil_radius = 1
            n_subiterations = 0

            def __call__(self, s):
                return s[0, 0]

            def get_time_dependent_value(self, i):
                return None

        with pytest.raises(TypeError, match="n_subiterations"):
            validate_transition_function(BadSub())

    def test_pytree_registration_traces_params(self):
        @transition_function
        class TF:
            stencil_radius = 1
            n_subiterations = 1
            coef: float = 2.0

            def __call__(self, s):
                return self.coef * s[0, 0]

            def get_time_dependent_value(self, i):
                return None

        leaves = jax.tree.leaves(TF(coef=3.0))
        assert leaves == [3.0]  # coef is a traced leaf, not a static constant


class TestHaloResolution:
    def test_default_halo_is_zero_cell(self):
        g = Grid.full(2, 2, TwoField(a=jnp.float32(1.0), b=jnp.int32(1)))
        halo = resolve_halo(None, g)
        assert float(halo.a) == 0.0 and int(halo.b) == 0
        assert halo.a.dtype == jnp.float32 and halo.b.dtype == jnp.int32

    def test_halo_cast_to_grid_dtypes(self):
        g = Grid.full(2, 2, jnp.float32(1.0))
        halo = resolve_halo(2, g)
        assert halo.dtype == jnp.float32

    def test_structure_mismatch_raises(self):
        g = Grid.full(2, 2, TwoField(a=jnp.float32(1.0), b=jnp.int32(1)))
        with pytest.raises(TypeError):
            resolve_halo(1.0, g)
