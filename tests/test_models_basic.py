"""Application tests: conway, jacobi, hotspot against independent numpy
oracles and the reference CLIs' I/O formats. These are the golden-output
regression tests SURVEY.md §4 notes the reference lacks.
"""

import io
import subprocess
import sys

import numpy as np
import pytest

from stencilstream_tpu import Grid
from stencilstream_tpu.models import conway, hotspot, jacobi
from stencilstream_tpu.utils.io import (
    read_char_grid,
    read_float_grid_binary,
    write_char_grid,
)


# ---------------------------------------------------------------- numpy oracles
def conway_step_np(g: np.ndarray) -> np.ndarray:
    p = np.pad(g.astype(np.int32), 1)
    count = sum(
        p[1 + dr : 1 + dr + g.shape[0], 1 + dc : 1 + dc + g.shape[1]]
        for dr in (-1, 0, 1)
        for dc in (-1, 0, 1)
        if (dr, dc) != (0, 0)
    )
    return np.where(g, (count == 2) | (count == 3), count == 3)


def hotspot_step_np(temp, power, k):
    h, w = temp.shape
    pt = np.pad(temp, 1)
    top = pt[:-2, 1:-1].copy()
    bottom = pt[2:, 1:-1].copy()
    left = pt[1:-1, :-2].copy()
    right = pt[1:-1, 2:].copy()
    top[0, :] = temp[0, :]
    bottom[-1, :] = temp[-1, :]
    left[:, 0] = temp[:, 0]
    right[:, -1] = temp[:, -1]
    return (
        temp
        + k.Cap_1
        * (
            power
            + (bottom + top - 2.0 * temp) * k.Ry_1
            + (right + left - 2.0 * temp) * k.Rx_1
            + (hotspot.AMB_TEMP - temp) * k.Rz_1
        )
    ).astype(np.float32)


# ---------------------------------------------------------------------- conway
class TestConway:
    def test_vs_numpy_random(self):
        rng = np.random.default_rng(42)
        g = rng.random((32, 48)) < 0.4
        out, _ = conway.run(Grid.from_numpy(g), 5)
        ref = g
        for _ in range(5):
            ref = conway_step_np(ref)
        np.testing.assert_array_equal(out.to_numpy(), ref)

    def test_char_io_roundtrip(self):
        g = np.array([[1, 0], [0, 1]], dtype=bool)
        buf = io.StringIO()
        write_char_grid(buf, g)
        assert buf.getvalue() == "X.\n.X\n"
        back = read_char_grid(io.StringIO(buf.getvalue()), 2, 2)
        np.testing.assert_array_equal(back, g)

    def test_char_input_errors(self):
        with pytest.raises(ValueError, match="truncated"):
            read_char_grid(io.StringIO("X."), 2, 2)
        with pytest.raises(ValueError, match="unexpected character"):
            read_char_grid(io.StringIO("XQ\n.."), 2, 2)

    def test_cli_end_to_end(self):
        # Blinker via the real CLI process (stdin/stdout protocol parity).
        inp = ".....\n.....\n.XXX.\n.....\n.....\n"
        proc = subprocess.run(
            [sys.executable, "-m", "stencilstream_tpu.models.conway", "5", "5", "1"],
            input=inp,
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=300,
        )
        assert proc.returncode == 0, proc.stderr
        assert proc.stdout == ".....\n..X..\n..X..\n..X..\n.....\n"


# ---------------------------------------------------------------------- jacobi
class TestJacobi:
    @pytest.mark.parametrize("variant", sorted(jacobi.VARIANTS))
    def test_all_variants_run(self, variant):
        n = jacobi.VARIANTS[variant].n_coefficients
        kernel = jacobi.make_kernel(variant, [0.1] * n)
        grid = jacobi.init_grid(12, 16)
        out, _ = jacobi.run(grid, kernel, 2)
        assert out.shape == (12, 16)
        assert np.isfinite(out.to_numpy()).all()

    def test_jacobi5_general_vs_numpy(self):
        coefs = [0.15, 0.2, 0.25, 0.1, 0.3]
        kernel = jacobi.make_kernel("jacobi5_general", coefs)
        grid = jacobi.init_grid(16, 16)
        out = jacobi.run(grid, kernel, 3)[0].to_numpy()

        ref = np.asarray(grid.arrays)
        for _ in range(3):
            p = np.pad(ref, 1)
            ref = (
                coefs[0] * p[:-2, 1:-1]
                + coefs[1] * p[1:-1, :-2]
                + coefs[2] * p[2:, 1:-1]
                + coefs[3] * p[1:-1, 2:]
                + coefs[4] * p[1:-1, 1:-1]
            ).astype(np.float32)
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_coefficient_count_validation(self):
        with pytest.raises(ValueError, match="5 coefficient"):
            jacobi.make_kernel("jacobi5_general", [1.0])

    def test_block_init(self):
        g = jacobi.init_grid(8, 8).to_numpy()
        assert g[4, 4] == 1.0 and g[0, 0] == 0.0
        assert g.sum() == 16.0

    def test_cli_and_show_config(self, tmp_path):
        proc = subprocess.run(
            [sys.executable, "-m", "stencilstream_tpu.models.jacobi", "show-config", "jacobi5_general"],
            capture_output=True, text=True, cwd="/root/repo", timeout=120,
        )
        assert proc.returncode == 0
        import json
        cfg = json.loads(proc.stdout)
        assert cfg["n_operations"] == 9 and cfg["n_coefficients"] == 5

        out_file = tmp_path / "out.bin"
        proc = subprocess.run(
            [
                sys.executable, "-m", "stencilstream_tpu.models.jacobi",
                "8", "8", "2", str(out_file), "0.2", "0.2", "0.2", "0.2", "0.2",
            ],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert proc.returncode == 0, proc.stderr
        assert "Walltime:" in proc.stdout
        dumped = read_float_grid_binary(str(out_file), 8, 8)
        assert np.isfinite(dumped).all()


# --------------------------------------------------------------------- hotspot
class TestHotspot:
    def test_vs_numpy(self):
        rng = np.random.default_rng(7)
        temp = (320.0 + 10 * rng.random((24, 24))).astype(np.float32)
        power = rng.random((24, 24)).astype(np.float32)
        k = hotspot.derive_coefficients(24, 24)
        grid = Grid.from_numpy(hotspot.HotspotCell(temp=temp, power=power))
        out = hotspot.run(grid, 4, kernel=k)[0].to_numpy()

        ref = temp
        for _ in range(4):
            ref = hotspot_step_np(ref, power, k)
        np.testing.assert_allclose(out.temp, ref, rtol=2e-5)
        np.testing.assert_array_equal(out.power, power)

    def test_boundary_clamp_differs_from_halo(self):
        """The in-kernel clamp must override the halo value: a uniform grid
        stays uniform under diffusion (halo would cool the edges)."""
        temp = np.full((8, 8), 300.0, np.float32)
        power = np.zeros((8, 8), np.float32)
        k = hotspot.derive_coefficients(8, 8)
        grid = Grid.from_numpy(hotspot.HotspotCell(temp=temp, power=power))
        out = hotspot.run(grid, 10, kernel=k)[0].to_numpy()
        # Uniform temperature only decays toward ambient via Rz, identically
        # everywhere — no edge artifacts.
        assert np.ptp(out.temp) < 1e-4

    def test_file_io_text_and_binary(self, tmp_path):
        rng = np.random.default_rng(3)
        temp = (320 + rng.random((6, 6))).astype(np.float32)
        power = rng.random((6, 6)).astype(np.float32)

        tf, pf = tmp_path / "temp.txt", tmp_path / "power.txt"
        np.savetxt(tf, temp.ravel())
        np.savetxt(pf, power.ravel())
        g = hotspot.read_input(str(tf), str(pf), 6, 6, binary=False)
        np.testing.assert_allclose(g.to_numpy().temp, temp, rtol=1e-6)

        tb, pb = tmp_path / "temp.bin", tmp_path / "power.bin"
        temp.tofile(tb)
        power.tofile(pb)
        g = hotspot.read_input(str(tb), str(pb), 6, 6, binary=True)
        np.testing.assert_array_equal(g.to_numpy().power, power)
