"""Golden regression tests: frozen reference-backend outputs.

The reference repo has no golden-output tests (SURVEY.md §4 notes the gap);
these freeze the oracle's behavior so semantic drift in the core/backends is
caught even when all backends drift together.
"""

import numpy as np
import pytest

from stencilstream_tpu.core import Grid


def test_hotspot_golden():
    from stencilstream_tpu.models import hotspot as hs

    rng = np.random.default_rng(1234)
    g = Grid.from_numpy(
        hs.HotspotCell(
            temp=rng.uniform(70, 90, (64, 64)).astype(np.float32),
            power=rng.uniform(0, 1e-3, (64, 64)).astype(np.float32),
        )
    )
    out, _ = hs.run(g, 100, backend="reference")
    t = out.to_numpy().temp
    np.testing.assert_allclose(t.sum(), 327761.4375, rtol=1e-6)
    np.testing.assert_allclose(t[17, 42], 71.0649185180664, rtol=1e-6)


def test_conway_golden():
    from stencilstream_tpu.models import conway

    rng = np.random.default_rng(1234)
    rng.uniform(70, 90, (64, 64))  # keep stream alignment with generation run
    rng.uniform(0, 1e-3, (64, 64))
    soup = rng.random((32, 32)) < 0.35
    out, _ = conway.run(Grid.from_numpy(soup), 20, backend="reference")
    assert int(out.to_numpy().sum()) == 124


def test_fdtd_golden():
    from stencilstream_tpu.models import fdtd

    params = fdtd.Parameters.from_json(
        {
            "tau": 100e-15,
            "dx": 10e-9,
            "time": {"t_cutoff": 7.0, "t_detect": 4.0, "t_max": 0.02},
            "source": {"frequency": 120e12, "phase": 3.0, "x": 0, "y": 0, "radius": 0.0},
            "cavity_rings": [
                {"radius": 86e-9, "mu_r": 11.56, "eps_r": 1.0, "sigma": 0.0}
            ],
        }
    )
    res = fdtd.CoefResolver(params)
    grid = fdtd.init_grid(params, res)
    assert params.n_timesteps() == 86
    up, _ = fdtd.build_simulation(params, resolver=res, backend="reference")
    o = up(grid).to_numpy()
    np.testing.assert_allclose(np.abs(o.hz).sum(), 0.003578461240977049, rtol=1e-5)


def test_convection_golden():
    from stencilstream_tpu.models import convection

    e = convection.Experiment(
        lx=3.0, ly=1.0, px=1.5, py=0.5, eta0=1.0, DcT=1.0, deltaT=1.0,
        Ra=1e7, Pra=1e3, res=16, iterMax=100, nt=1, nout=1, nerr=50,
        epsilon=1e-3, dmp=2.0,
    )
    grid, stats = convection.run(e, backend="reference", verbose=False)
    c = grid.to_numpy()
    np.testing.assert_allclose(c.T.sum(), 1.2409543991088867, rtol=1e-5)
    assert stats["stats"][0]["iters"] == 100
