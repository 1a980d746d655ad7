"""Line-cache strip kernel: sequential strips carrying overlap rows in VMEM.

The pad-mode :class:`~.strip_pass.StripPass` re-reads AND re-computes
``2 * halo`` rows per strip (redundancy ``(T + 2*hp) / T`` — 1.14x at
T=224/p=16). The FPGA reference never pays that: its monotile kernel carries
boundary rows between pipeline stages in a 2-bank on-chip line cache
(``monotile/internal/StencilUpdateKernel.hpp:180-186``). This module is the
TPU restatement of that idea for the strip decomposition:

* strips are processed **sequentially** (``dimension_semantics=("arbitrary",)``)
  top to bottom;
* per fused sub-step level ``s`` (of ``S = p * k``), a VMEM scratch carries
  the bottom ``2r`` rows of the *previous* strip's level-``s`` window — the
  rows the next strip's vertical taps need;
* strip ``j`` reads input rows ``[j*T + hp, (j+1)*T + hp)`` — a plain
  stride-``T`` element window, **no overlap** — and each sub-step *skews* the
  represented row range up by ``r``: level ``s`` covers rows
  ``[j*T + hp - s*r, ...+T)``, so after ``S`` levels the strip holds output
  rows ``[j*T, (j+1)*T)`` exactly;
* vertical taps are static slices of ``concat(carried_rows, window)`` — no
  halo-value substitution and no out-of-grid re-mask anywhere in the kernel.

Grid-edge correctness is restored *outside* the kernel: the top and bottom
``B = 2*hp`` output rows (the only rows whose dependency cone touches the
zero-initialized carry, the junk pad rows, or the missing top/bottom halo
substitution) are recomputed each pass by two tiny extended-mode
:class:`~.strip_pass.StripPass` calls over ``B + 2*hpm``-row blocks of the
pass input and patched over the line-cache output (<1% of the grid at
8192^2). Interior rows are BIT-exact against the pad-mode kernel
(``experiments/micro_linecache.py --check``).

This removes both the redundant HBM re-read and the redundant halo
recompute of overlapped tiling — the strip analog of the reference's
zero-redundancy monotile regime, at tiling-scale grids.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.cell import canonicalize_cell
from ..core.stencil import Stencil
from .fused import shifted
from .pallas_util import HoistedFn, KernelTDV, Operands, round_up
from .strip_pass import cell_row_bytes, cell_sublane_multiple

__all__ = ["LineCachePass"]


class LineCachePass:
    """Builds (once per trace) the line-cache Pallas kernel and runs one pass.

    Args:
      arrays: example cell pytree of the pass carry — ``(Hs, Ws)`` leaves
        with ``Hs >= n_strips * T + hp`` (the last strip's input window must
        exist; the pad rows' values are junk by construction and are never
        read back uncorrected — see the band-patch contract above).
      grid_range: logical grid extent ``(H, W)``; requires ``W == Ws``
        (lane-padded grids take the pad-mode path).

    The output has ``n_strips * T`` valid rows; rows past that (up to
    ``Hs``) are uninitialized junk inside the pad region. Callers patch the
    top/bottom ``B`` rows from a band fix before the next pass.
    """

    def __init__(
        self,
        arrays,
        tf,
        halo_cell,
        strategy,
        tdv_aux,
        *,
        radius: int,
        n_subiterations: int,
        n_iterations: int,
        iters_per_pass: int,
        strip_rows: int,
        grid_range: tuple[int, int],
        shift_impl: str = "concat",
        interpret: bool = False,
        io_alias: bool = True,
    ):
        H, W = grid_range
        Hs, Ws = jax.tree.leaves(arrays)[0].shape
        assert W == Ws, "line-cache requires a lane-aligned grid width"
        r, k, p = radius, n_subiterations, iters_per_pass
        S = p * k
        hp = r * S
        m = cell_sublane_multiple(arrays)
        T = max(round_up(strip_rows, m), m)
        if 2 * r > T:
            raise ValueError(
                f"line-cache carry slots hold the strip's bottom 2*radius "
                f"rows, so 2*radius must be <= strip_rows "
                f"(2*{r} > {T}); use a taller strip or the clamped mode"
            )
        n_strips = -(-H // T)
        assert Hs >= n_strips * T + hp, (Hs, n_strips, T, hp)
        self.T, self.hp, self.n_strips = T, hp, n_strips
        self.out_rows = Hs

        has_partial = (n_iterations % p) != 0
        tap_mask = not getattr(tf, "handles_boundary", False)

        def encode(a):
            return a.astype(jnp.int8) if a.dtype == jnp.bool_ else a

        ktdv = KernelTDV(strategy, tf, tdv_aux, n_iterations)
        self.ktdv = ktdv

        # One fused iteration: k sub-iteration phases, each consuming one
        # carry slot and skewing the window up by r rows. Returns the new
        # window plus the k carry slots to store for the NEXT strip (the
        # entry window's bottom 2r rows at each level).
        def iter_fn(own, cprevs, tf, halo_cell, row0_base, i_abs, active, tdv):
            new_carries = []
            for sub in range(k):
                new_carries.append(
                    jax.tree.map(lambda a: a[T - 2 * r :, :], own)
                )
                cprev = cprevs[sub]
                ext = jax.tree.map(
                    lambda c, o: jnp.concatenate([c, o], axis=0), cprev, own
                )
                row0 = row0_base - (sub + 1) * r

                def neighbor(dr, dc, _ext=ext):
                    def one(a, hv):
                        a2 = lax.slice_in_dim(a, r + dr, r + dr + T, axis=0)
                        if dc:
                            a2 = shifted(a2, dc, 1, hv, mask=tap_mask)
                        return a2

                    return jax.tree.map(one, _ext, halo_cell)

                row = (
                    lax.broadcasted_iota(jnp.int32, (T, Ws), 0)
                    + jnp.asarray(row0, jnp.int32)
                )
                col = lax.broadcasted_iota(jnp.int32, (T, Ws), 1)
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
                if has_partial:
                    new = jax.tree.map(
                        lambda n, c: jnp.where(active, n, c), new, center
                    )
                own = new
            return own, new_carries

        example_window = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct((T, Ws), a.dtype), arrays
        )
        example_carry = [
            jax.tree.map(
                lambda a: jax.ShapeDtypeStruct((2 * r, Ws), a.dtype), arrays
            )
            for _ in range(k)
        ]
        i0 = jnp.asarray(0, jnp.int32)

        from . import fused as _fused

        _prev_impl = _fused.SHIFT_IMPL
        _fused.SHIFT_IMPL = shift_impl
        try:
            hoisted_iter = HoistedFn(
                iter_fn,
                example_window,
                example_carry,
                tf,
                halo_cell,
                i0,
                i0,
                jnp.asarray(True),
                ktdv.example,
            )
        finally:
            _fused.SHIFT_IMPL = _prev_impl
        self._hoisted_iter = hoisted_iter

        # Loop-invariant cell fields (HotSpot's power map, FDTD's material
        # coefficients): at pass level the line-cache output of such a field
        # equals its input rows verbatim (the in-kernel skew is realized by
        # the center slice the identity jaxpr reduces to), so skip its HBM
        # write stream and reuse the input array — same elision contract as
        # StripPass. Detected on a pad-mode trace where identity is a
        # literal outvar-is-invar match.
        from .fused import fused_substep

        def _pad_step(window, tf, halo_cell, i_abs, active, tdv):
            out, _, _ = fused_substep(
                window, tf, halo_cell, 0, 0, (H, W), i_abs, tdv, active,
                radius=r, n_subiterations=k, row_mode="pad", col_mode="pad",
                oog_mask=False,
            )
            return out

        n_fields = len(jax.tree.leaves(arrays))
        _det = HoistedFn(
            _pad_step, example_window, tf, halo_cell, i0,
            jnp.asarray(True), ktdv.example,
        )
        win_invars = _det.jaxpr.invars[:n_fields]
        outvars = _det.jaxpr.outvars
        invariant = [o is iv for o, iv in zip(outvars, win_invars)]
        if all(invariant):
            invariant = [False] * n_fields
        self.invariant = invariant
        vpos = [j for j, inv in enumerate(invariant) if not inv]
        self._vpos = vpos

        tf_ops = Operands(tf, vectors_as_refs=False)
        halo_ops = Operands(halo_cell)
        scal_ops = Operands((i0, i0))
        const_ops = Operands(hoisted_iter.consts, vectors_as_refs=False)
        groups = (scal_ops, tf_ops, halo_ops, const_ops)
        counts = [len(g.values) for g in groups] + [len(ktdv.operands)]
        self._groups = groups

        arrays_treedef = jax.tree.structure(arrays)
        dtypes = [a.dtype for a in jax.tree.leaves(arrays)]
        stored_dtypes = [
            jnp.int8 if dt == jnp.bool_ else dt for dt in dtypes
        ]
        carry_treedef = jax.tree.structure(example_carry)

        def kernel(*refs):
            it = iter(refs)
            parts = [[next(it) for _ in range(c)] for c in counts]
            win_refs = [next(it) for _ in range(n_fields)]
            out_refs = [next(it) for _ in range(len(vpos))]
            carry_refs = list(it)  # n_fields scratch refs, (S, 2r, Ws)
            i_start_v, offset_v = scal_ops.decode(parts[0])
            tf_v = tf_ops.decode(parts[1])
            halo_v = halo_ops.decode(parts[2])
            consts_v = const_ops.decode(parts[3])
            tdv_decoded = ktdv.decode(parts[4])

            j = pl.program_id(0)

            @pl.when(j == 0)
            def _():
                # Zero (not junk) carries: the band patch overwrites every
                # affected output row, but NaN-free junk keeps the pad-row
                # arithmetic finite for all app kernels.
                for cr in carry_refs:
                    cr[...] = jnp.zeros_like(cr)

            own_stored = [wr[:] for wr in win_refs]

            for i in range(p):
                i_abs = i_start_v + i
                if has_partial:
                    i_rel = lax.max(
                        0, lax.min(i_abs - offset_v, n_iterations - 1)
                    )
                else:
                    i_rel = i_abs - offset_v
                tdv = ktdv.lookup(tdv_decoded, tf_v, i_rel, i_abs)
                cprev_stored = [
                    [carry_refs[f][i * k + sub] for f in range(n_fields)]
                    for sub in range(k)
                ]
                own = jax.tree.unflatten(
                    arrays_treedef,
                    [
                        l.astype(jnp.bool_) if dt == jnp.bool_ else l
                        for l, dt in zip(own_stored, dtypes)
                    ],
                )
                cprevs = [
                    jax.tree.unflatten(
                        arrays_treedef,
                        [
                            l.astype(jnp.bool_) if dt == jnp.bool_ else l
                            for l, dt in zip(cp, dtypes)
                        ],
                    )
                    for cp in cprev_stored
                ]
                row0_base = j * T + hp - i * k * r
                own_new, new_carries = hoisted_iter(
                    own,
                    cprevs,
                    tf_v,
                    halo_v,
                    jnp.asarray(row0_base, jnp.int32),
                    jnp.asarray(i_abs, jnp.int32),
                    i_abs < offset_v + n_iterations,
                    tdv,
                    consts=consts_v,
                )
                for sub in range(k):
                    leaves = jax.tree.leaves(new_carries[sub])
                    for f in range(n_fields):
                        carry_refs[f][i * k + sub] = encode(leaves[f])
                own_stored = [encode(l) for l in jax.tree.leaves(own_new)]

            for ref, jf in zip(out_refs, vpos):
                ref[:] = own_stored[jf]

        self._kernel = kernel
        self._n_fields = n_fields
        self._arrays_treedef = arrays_treedef
        self._dtypes = dtypes
        self.interpret = interpret
        self.Ws = Ws

        g_in = math.gcd(T, hp) or 1
        self._win_spec = pl.BlockSpec(
            (pl.Element(T), pl.Element(Ws)),
            lambda i: (pl.multiple_of(i * T + hp, g_in), 0),
            memory_space=pltpu.VMEM,
        )
        self._out_spec = pl.BlockSpec(
            (pl.Element(T), pl.Element(Ws)),
            lambda i: (pl.multiple_of(i * T, min(T, m)), 0),
            memory_space=pltpu.VMEM,
        )
        self._scratch_shapes = [
            pltpu.VMEM((S, 2 * r, Ws), sd) for sd in stored_dtypes
        ]
        window_bytes = T * cell_row_bytes(arrays)
        self._vmem_limit = min(
            int(window_bytes * 8) + (1 << 25), 120 * (1 << 20)
        )

        # In-place operation: the line-cache write pattern is strictly
        # forward (strip j writes rows [j*T, (j+1)*T), reads [j*T + hp,
        # (j+1)*T + hp) — never rows an earlier strip wrote), so each
        # non-invariant field's output can alias its input buffer. Measured
        # +14% on the bare kernel (experiments/micro_linecache.py lc/alias):
        # the overlapped-window pad mode structurally cannot do this. The
        # leading operand count maps field j's window input to its output.
        self._io_aliases = {}
        if io_alias:
            n_lead = sum(counts)
            self._io_aliases = {
                n_lead + jf: o for o, jf in enumerate(vpos)
            }

    def run(self, arrays, i_start, offset):
        """One pass of ``iters_per_pass`` fused iterations over the carry.

        Returns a carry-shaped pytree whose rows ``[0, n_strips * T)`` hold
        the pass output (top/bottom ``2*hp`` rows pending the band patch);
        rows past ``n_strips * T`` are unwritten junk inside the pad region.
        """
        scal_ops, tf_ops, halo_ops, const_ops = self._groups
        scal_vals = Operands(
            (jnp.asarray(i_start, jnp.int32), jnp.asarray(offset, jnp.int32))
        ).values
        in_leaves = jax.tree.leaves(arrays)
        stored = [
            a.astype(jnp.int8) if a.dtype == jnp.bool_ else a
            for a in in_leaves
        ]
        vpos = self._vpos
        outs = pl.pallas_call(
            self._kernel,
            grid=(self.n_strips,),
            in_specs=(
                list(scal_ops.specs)
                + list(tf_ops.specs)
                + list(halo_ops.specs)
                + list(const_ops.specs)
                + list(self.ktdv.specs)
                + [self._win_spec] * self._n_fields
            ),
            out_specs=[self._out_spec] * len(vpos),
            out_shape=[
                jax.ShapeDtypeStruct((self.out_rows, self.Ws), stored[j].dtype)
                for j in vpos
            ],
            scratch_shapes=self._scratch_shapes,
            input_output_aliases=self._io_aliases,
            # Strips are a sequential chain through the carry scratch —
            # NEVER parallel.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=self._vmem_limit,
                dimension_semantics=("arbitrary",),
            ),
            interpret=self.interpret,
        )(
            *scal_vals,
            *tf_ops.values,
            *halo_ops.values,
            *const_ops.values,
            *self.ktdv.operands,
            *stored,
        )
        outs = iter(outs)
        leaves = []
        for j, a in enumerate(in_leaves):
            if self.invariant[j]:
                leaves.append(a)
            else:
                o = next(outs)
                leaves.append(
                    o.astype(jnp.bool_)
                    if self._dtypes[j] == jnp.bool_
                    else o
                )
        return jax.tree.unflatten(self._arrays_treedef, leaves)
