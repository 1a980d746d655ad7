"""Reference-backend tests built on the self-verifying probe fixture.

Sweeps mirror the reference's monotile kernel tests
(``tests/monotile/internal/StencilUpdateKernel.cpp:89-135``): grid sizes
power-of-two and off-by-one, iteration offsets, radii, and partial/zero
iteration counts; plus TDV-strategy and numeric-app sanity checks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from probe import ProbeTransFunc, check_probe_grid, make_probe_grid, probe_halo_cell
from stencilstream_tpu import Grid, Params, reference
from stencilstream_tpu.tdv import (
    InlineTDV,
    PrecomputeOnDeviceTDV,
    PrecomputeOnHostTDV,
)


def run_probe(height, width, n_iterations, offset=0, radius=1, n_sub=2, tdv="inline"):
    grid = make_probe_grid(height, width, iteration_offset=offset)
    update = reference.StencilUpdate(
        Params(
            transition_function=ProbeTransFunc(radius_=radius, n_subiterations_=n_sub),
            halo_value=probe_halo_cell(),
            iteration_offset=offset,
            n_iterations=n_iterations,
            tdv_strategy=tdv,
        )
    )
    out = update(grid)
    check_probe_grid(out, offset + n_iterations)
    return update


@pytest.mark.parametrize(
    "height,width",
    [(8, 8), (9, 9), (17, 5), (64, 64), (1, 1), (1, 7), (7, 1)],
)
def test_probe_grid_sizes(height, width):
    run_probe(height, width, n_iterations=3)


@pytest.mark.parametrize("offset", [0, 1, 5, 100])
def test_probe_iteration_offsets(offset):
    run_probe(10, 12, n_iterations=4, offset=offset)


@pytest.mark.parametrize("radius", [1, 2, 3])
def test_probe_radii(radius):
    run_probe(12, 12, n_iterations=2, radius=radius)


@pytest.mark.parametrize("n_sub", [1, 2, 3])
def test_probe_subiterations(n_sub):
    run_probe(8, 8, n_iterations=3, n_sub=n_sub)


def test_zero_iterations_is_identity():
    grid = make_probe_grid(6, 6, iteration_offset=2)
    update = reference.StencilUpdate(
        Params(
            transition_function=ProbeTransFunc(),
            halo_value=probe_halo_cell(),
            iteration_offset=2,
            n_iterations=0,
        )
    )
    out = update(grid)
    check_probe_grid(out, 2)


@pytest.mark.parametrize(
    "strategy", [InlineTDV(), PrecomputeOnDeviceTDV(), PrecomputeOnHostTDV()]
)
def test_probe_all_tdv_strategies(strategy):
    # The probe asserts tdv == iteration inside the kernel, so this verifies
    # all three strategies deliver offset-correct values (the sweep the
    # reference runs at tests/monotile/StencilUpdate.cpp:38-79).
    run_probe(9, 9, n_iterations=3, offset=7, tdv=strategy)


def test_resume_equals_one_shot():
    """iteration_offset pause/resume (cpu/StencilUpdate.hpp:64-70): running
    2+3 iterations with an offset must equal running 5 straight."""
    grid = make_probe_grid(11, 13)
    tf = ProbeTransFunc()
    p = Params(transition_function=tf, halo_value=probe_halo_cell(), n_iterations=2)
    update = reference.StencilUpdate(p)
    mid = update(grid)
    update.get_params().iteration_offset = 2
    update.get_params().n_iterations = 3
    out = update(mid)
    check_probe_grid(out, 5)


def test_input_grid_not_modified():
    grid = make_probe_grid(5, 5)
    before = grid.to_numpy()
    reference.apply_iterations(grid, ProbeTransFunc(), 2, halo_value=probe_halo_cell())
    after = grid.to_numpy()
    np.testing.assert_array_equal(before.i_iteration, after.i_iteration)


def test_walltime_and_cell_counters_accumulate():
    update = run_probe(10, 10, n_iterations=3)
    assert update.get_n_processed_cells() == 3 * 10 * 10
    assert update.get_walltime() > 0.0
    # second call accumulates
    grid = make_probe_grid(10, 10, iteration_offset=3)
    update.get_params().iteration_offset = 3
    update(grid)
    assert update.get_n_processed_cells() == 2 * 3 * 10 * 10


class TestNumericOracle:
    """Cross-checks against straightforward numpy implementations."""

    def test_jacobi4_vs_numpy(self):
        from stencilstream_tpu import BaseTransitionFunction, transition_function

        @transition_function
        class Jacobi4:
            stencil_radius = 1
            n_subiterations = 1

            def __call__(self, s):
                return (s[-1, 0] + s[0, -1] + s[1, 0] + s[0, 1]) * 0.25

            def get_time_dependent_value(self, i):
                return None

        rng = np.random.default_rng(0)
        a = rng.random((16, 20)).astype(np.float32)
        grid = Grid.from_numpy(a)
        out = reference.apply_iterations(grid, Jacobi4(), 3).to_numpy()

        ref = a.copy()
        for _ in range(3):
            p = np.pad(ref, 1)
            ref = ((p[:-2, 1:-1] + p[1:-1, :-2] + p[2:, 1:-1] + p[1:-1, 2:]) * 0.25).astype(
                np.float32
            )
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_bool_cells_conway_blinker(self):
        from stencilstream_tpu import transition_function

        @transition_function
        class Conway:
            stencil_radius = 1
            n_subiterations = 1

            def __call__(self, s):
                alive = s[0, 0]
                count = jnp.zeros(alive.shape, jnp.int32)
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        if dr == 0 and dc == 0:
                            continue
                        count = count + s[dr, dc].astype(jnp.int32)
                return jnp.where(alive, (count == 2) | (count == 3), count == 3)

            def get_time_dependent_value(self, i):
                return None

        blinker = np.zeros((5, 5), bool)
        blinker[2, 1:4] = True  # horizontal blinker
        out1 = reference.apply_iterations(Grid.from_numpy(blinker), Conway(), 1).to_numpy()
        expected = np.zeros((5, 5), bool)
        expected[1:4, 2] = True  # vertical
        np.testing.assert_array_equal(out1, expected)
        out2 = reference.apply_iterations(Grid.from_numpy(blinker), Conway(), 2).to_numpy()
        np.testing.assert_array_equal(out2, blinker)

    def test_mutating_params_changes_result_without_structure_change(self):
        from stencilstream_tpu import transition_function

        @transition_function
        class Scale:
            stencil_radius = 1
            n_subiterations = 1
            coef: float = 2.0

            def __call__(self, s):
                return self.coef * s[0, 0]

            def get_time_dependent_value(self, i):
                return None

        grid = Grid.full(4, 4, jnp.float32(1.0))
        update = reference.StencilUpdate(Params(transition_function=Scale()))
        out = update(grid)
        np.testing.assert_allclose(np.asarray(out.arrays), 2.0)
        update.get_params().transition_function.coef = 5.0
        out = update(grid)
        np.testing.assert_allclose(np.asarray(out.arrays), 5.0)
