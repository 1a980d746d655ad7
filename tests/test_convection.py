"""Convection application tests: experiment schema, initial condition,
kernel semantics (error fields, boundary conditions), and the convergence
driver.
"""

import dataclasses
import json

import numpy as np
import pytest

from stencilstream_tpu import Grid, Params, reference
from stencilstream_tpu.models import convection


def tiny_experiment(**overrides):
    base = dict(
        lx=3.0, ly=1.0, px=1.5, py=0.5, eta0=1.0, DcT=1.0, deltaT=1.0,
        Ra=1e7, Pra=1e3, res=16, iterMax=400, nt=2, nout=1, nerr=50,
        epsilon=1e-3, dmp=2.0,
    )
    base.update(overrides)
    return convection.Experiment(**base)


class TestExperiment:
    def test_load_reference_experiment_file(self):
        e = convection.Experiment.load(
            "/root/reference/examples/convection/experiments/default.json"
        )
        assert e.res == 96 and e.nt == 3000
        # Derived numerics (convection.cpp:326-355)
        assert e.nx == 96 * 3 - 1 and e.ny == 96 - 1
        assert np.isclose(e.rho, 1.0 / 1e3 * 1.0 / 1.0)
        assert np.isclose(e.dampX, 1.0 - 2.0 / e.nx)

    def test_missing_field_raises(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text(json.dumps({"lx": 1.0}))
        with pytest.raises(ValueError, match="ly"):
            convection.Experiment.load(str(p))


class TestInitialCondition:
    def test_plates_and_blob(self):
        e = tiny_experiment()
        grid = convection.init_grid(e)
        T = grid.to_numpy().T
        # hot bottom plate (y == 0), cold top plate (y == ny-1)
        np.testing.assert_allclose(T[:, 0], 0.5)
        np.testing.assert_allclose(T[:, e.ny - 1], -0.5)
        # blob peak near (px, py)
        interior = T[1 : e.nx, 1 : e.ny - 1]
        peak = np.unravel_index(np.argmax(interior), interior.shape)
        assert abs((peak[0] + 1) * e.dx - e.px) < 3 * e.dx
        assert abs((peak[1] + 1) * e.dy - e.py) < 3 * e.dy
        # all other fields zero
        assert np.abs(grid.to_numpy().Vx).max() == 0.0


class TestKernelSemantics:
    def test_error_fields_measure_change(self):
        """After one pseudo-transient iteration, ErrV == Vy_before - Vy_after
        in the active region (assign! ... compute_error!, convection.cpp:99-178)."""
        e = tiny_experiment()
        grid = convection.init_grid(e)
        update = reference.StencilUpdate(
            Params(
                transition_function=convection.make_pseudo_transient_kernel(e),
                halo_value=convection.zero_cell(),
                n_iterations=1,
            )
        )
        before = grid.to_numpy()
        after = update(grid).to_numpy()
        region = np.s_[: e.nx, :]
        np.testing.assert_allclose(
            after.ErrV[region],
            before.Vy[region] - after.Vy[region],
            atol=1e-6,
        )
        p_region = np.s_[: e.nx, : e.ny]
        np.testing.assert_allclose(
            after.ErrP[p_region],
            before.Pt[p_region] - after.Pt[p_region],
            atol=1e-6,
        )

    def test_thermal_flux_boundary_conditions(self):
        e = tiny_experiment()
        grid = convection.init_grid(e)
        kernel = convection.ThermalSolverKernel(
            nx=e.nx, ny=e.ny, dx=np.float32(e.dx), dy=np.float32(e.dy),
            dt=np.float32(e.dt_diff), DcT=np.float32(e.DcT),
        )
        out = reference.apply_iterations(
            grid, kernel, 1, halo_value=convection.zero_cell()
        ).to_numpy()
        # no_fluxY_T: T[0, y] == T[1, y] and T[nx-1, y] == T[nx-2, y] for y < ny
        np.testing.assert_array_equal(out.T[0, : e.ny], out.T[1, : e.ny])
        np.testing.assert_array_equal(out.T[e.nx - 1, : e.ny], out.T[e.nx - 2, : e.ny])


class TestDriver:
    def test_convergence_loop_and_csv(self, tmp_path):
        e = tiny_experiment()
        grid, info = convection.run(e, out_dir=str(tmp_path), verbose=False)
        out = grid.to_numpy()
        assert np.isfinite(out.T).all() and np.isfinite(out.Vy).all()
        # convection develops: velocity is nonzero
        assert np.abs(out.Vy).max() > 0
        # errors reported and finite
        assert all(np.isfinite(s["errV"]) for s in info["stats"])
        # CSV frames written every nout steps with the (nx, ny) T region
        frames = sorted(tmp_path.glob("*.csv"))
        assert len(frames) == e.nt
        data = np.loadtxt(frames[0], delimiter=",")
        assert data.shape == (e.nx, e.ny)

    def test_adaptive_dt_mutation_does_not_break(self):
        e = tiny_experiment(nt=3, iterMax=100)
        grid, info = convection.run(e, verbose=False)
        dts = [s["dt"] for s in info["stats"]]
        assert all(np.isfinite(d) and d > 0 for d in dts)
