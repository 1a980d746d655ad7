"""Transposed execution for wide-and-short grids (tiling backend).

The TPU-native restatement of the reference's 2D tile calculus
(``tiling/Grid.hpp:305-424``): a grid with too few rows to strip-decompose
runs on the transposed layout, with the Stencil view swapping offsets and
coordinates so transition functions observe the original geometry.
"""

import numpy as np

from stencilstream_tpu.core import Grid, Params
from stencilstream_tpu.backends import tiling

from probe import ProbeTransFunc, check_probe_grid, make_probe_grid, probe_halo_cell


def test_probe_contract_on_wide_short_grid():
    """64 x 512: rows < 128 <= cols triggers transposed execution; the probe
    checks every coordinate/iteration/halo property from inside the kernel,
    so a wrong swap anywhere fails loudly."""
    up = tiling.StencilUpdate(
        Params(
            transition_function=ProbeTransFunc(),
            halo_value=probe_halo_cell(),
            iteration_offset=1,
            n_iterations=3,
        ),
        strip_rows=64,
        iters_per_pass=2,
    )
    up.fallback_to_reference = False
    check_probe_grid(up(make_probe_grid(64, 512, iteration_offset=1)), 4)


def test_wide_short_matches_oracle_hotspot():
    from stencilstream_tpu.backends import create_update
    from stencilstream_tpu.models.hotspot import HotspotCell, derive_coefficients
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    h, w = 48, 640
    grid = Grid.from_numpy(
        HotspotCell(
            temp=rng.uniform(70, 90, (h, w)).astype(np.float32),
            power=rng.uniform(0, 1e-3, (h, w)).astype(np.float32),
        )
    )
    kernel = derive_coefficients(h, w)
    halo = HotspotCell(temp=jnp.float32(0), power=jnp.float32(0))
    up = tiling.StencilUpdate(
        Params(transition_function=kernel, halo_value=halo, n_iterations=6),
        strip_rows=128,
        iters_per_pass=4,
    )
    up.fallback_to_reference = False
    out = up(grid)
    ref = create_update(
        Params(transition_function=kernel, halo_value=halo, n_iterations=6),
        backend="reference",
    )(grid)
    np.testing.assert_allclose(
        out.to_numpy().temp, ref.to_numpy().temp, rtol=2e-6, atol=1e-5
    )


class TestExtremeWidth:
    """The residual regime of the reference's width-split tile calculus
    (``tiling/Grid.hpp:305-424``): rows too wide for any VMEM strip window.
    Policy: transpose when the other orientation fits; clean capacity error
    (pointing at 2D-mesh column sharding) when both orientations are too
    wide. Exercised with a shrunken budget so the law runs at test size;
    the classification of the real-scale geometries (11-field x 2^16,
    both-axes-huge) is asserted against the production budget."""

    def _probe_update(self, **kw):
        up = tiling.StencilUpdate(
            Params(
                transition_function=ProbeTransFunc(),
                halo_value=probe_halo_cell(),
                n_iterations=2,
            ),
            **kw,
        )
        up.fallback_to_reference = False
        return up

    def test_too_wide_rows_transpose_when_columns_fit(self, monkeypatch):
        # 256 x 1024 with a toy budget: rows (1024 cols) overflow the
        # window, columns (256) fit -> transposed execution, full probe
        # contract (height >= 128, so the wide-short rule alone would NOT
        # have transposed this grid).
        monkeypatch.setattr(tiling, "TILING_VMEM_BUDGET", 2 * 1024 * 1024)
        out = self._probe_update(strip_rows=128, iters_per_pass=1)(
            make_probe_grid(256, 1024)
        )
        check_probe_grid(out, 2)

    def test_both_orientations_too_wide_runs_width_split(self, monkeypatch):
        """SURVEY row #15 (``tiling/Grid.hpp:305-424``): a grid too wide in
        BOTH orientations is cut into column panels with a lane-aligned
        compound column halo — single chip, full probe contract (which
        verifies coordinates/halo/iterations from inside the kernel, so a
        wrong base_col or a stale panel halo fails loudly)."""
        import warnings as _w

        monkeypatch.setattr(tiling, "TILING_VMEM_BUDGET", 3 * 512 * 1024)
        up = self._probe_update(strip_rows=128, iters_per_pass=2)
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            out = up(make_probe_grid(512, 512))
        assert any("WIDTH-SPLIT" in str(r.message) for r in rec)
        assert up.resolved_config["window_mode"] == "panels"
        assert up.resolved_config["panel_cols"] < 512
        check_probe_grid(out, 2)

    def test_width_split_matches_oracle_multifield(self, monkeypatch):
        """Width-split vs the oracle on a multi-field kernel with in-kernel
        boundary clamping (hotspot) — panel seams and the chp frame must be
        invisible in the output."""
        from stencilstream_tpu.backends import create_update
        from stencilstream_tpu.models.hotspot import (
            HotspotCell, derive_coefficients,
        )
        import jax.numpy as jnp
        import warnings as _w

        monkeypatch.setattr(tiling, "TILING_VMEM_BUDGET", 2 * 1024 * 1024)
        rng = np.random.default_rng(7)
        h, w = 1536, 1536  # 24-row window x 1536 cols x 8 B > budget/8 both ways
        grid = Grid.from_numpy(
            HotspotCell(
                temp=rng.uniform(70, 90, (h, w)).astype(np.float32),
                power=rng.uniform(0, 1e-3, (h, w)).astype(np.float32),
            )
        )
        kernel = derive_coefficients(h, w)
        halo = HotspotCell(temp=jnp.float32(0), power=jnp.float32(0))
        up = tiling.StencilUpdate(
            Params(transition_function=kernel, halo_value=halo, n_iterations=5),
            strip_rows=256,
            iters_per_pass=2,
        )
        up.fallback_to_reference = False
        with _w.catch_warnings():
            _w.simplefilter("ignore", RuntimeWarning)
            out = up(grid)
        assert up.resolved_config["window_mode"] == "panels"
        ref = create_update(
            Params(transition_function=kernel, halo_value=halo, n_iterations=5),
            backend="reference",
        )(grid)
        np.testing.assert_allclose(
            out.to_numpy().temp, ref.to_numpy().temp, rtol=2e-6, atol=1e-5
        )

    def test_single_panel_impossible_is_a_clean_error(self, monkeypatch):
        import pytest

        monkeypatch.setattr(tiling, "TILING_VMEM_BUDGET", 128 * 1024)
        with pytest.raises(ValueError, match="2D mesh"):
            self._probe_update()(make_probe_grid(1024, 1024))

    def test_real_budget_classification(self):
        """At the production budget: an 11-field f32 cell at W=2^16 must be
        classified transpose-needed (rows too wide, columns at H=1024 fit),
        and 2^18-wide-both-ways must be classified both-too-wide; a 64 x 2^20
        single-f32 grid transposes (columns fit)."""
        import jax.numpy as jnp

        row_bytes = tiling.StencilUpdate._row_bytes
        min_win = 8 + 2 * 8  # r=1, k=1 (conservative smallest window)
        budget = tiling.TILING_VMEM_BUDGET // 8

        eleven = [jnp.zeros((1, 1), jnp.float32)] * 11
        assert row_bytes(eleven, 1 << 16) * min_win > budget  # rows: no
        assert row_bytes(eleven, 1024) * min_win <= budget    # cols: yes

        one = [jnp.zeros((1, 1), jnp.float32)]
        assert row_bytes(one, 1 << 20) * min_win > budget     # rows: no
        assert row_bytes(one, 64) * min_win <= budget         # cols: yes
        assert row_bytes(one, 1 << 18) * min_win > budget     # both-huge
