"""Reusable Pallas strip-pass kernel: p fused iterations over full-width
row strips.

This is the shared compute core of the two HBM-regime backends — the analog
of the reference sharing ONE StencilUpdateKernel between its single-FPGA and
multi-FPGA designs (``monotile/internal/StencilUpdateDesign.hpp:221-348``):

* the **tiling** backend runs it over the whole (row-padded) grid with
  *clamped* overlapping windows (edge strips reuse the interior window shape,
  ``mode="clamped"``);
* the **distributed** backend runs it inside ``shard_map`` over each device's
  halo-extended local block (``mode="extended"``), after a collective
  ``exchange_halo``; the per-device global row origin rides in as a scalar
  operand.

Both modes share the same per-strip kernel: an element-indexed overlapping
input window (``strip_rows + 2*halo`` rows, double-buffered by the Pallas
pipeline), ``p * n_subiterations`` fused sub-steps at fixed window size with
out-of-grid re-masking and partial-pass pass-through (:mod:`.fused`), and a
core-rows-only blocked output — the TPU-native restatement of
``tiling/internal/{HaloTiledInputKernel,StencilUpdateKernel}.hpp``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused import fused_substep, halo_width
from .pallas_util import (
    HoistedFn,
    KernelTDV,
    Operands,
    round_up,
    sublane_multiple,
)

__all__ = ["StripPass", "cell_sublane_multiple", "cell_row_bytes"]


def cell_sublane_multiple(arrays) -> int:
    m = 8
    for a in jax.tree.leaves(arrays):
        dt = jnp.int8 if a.dtype == jnp.bool_ else a.dtype
        m = max(m, sublane_multiple(dt))
    return m


def cell_row_bytes(arrays) -> int:
    leaves = jax.tree.leaves(arrays)
    width = leaves[0].shape[1]
    return sum(
        width
        * max(jnp.dtype(jnp.int8 if a.dtype == jnp.bool_ else a.dtype).itemsize, 1)
        for a in leaves
    )


class StripPass:
    """Builds (once per trace) the Pallas strip kernel and runs one pass.

    Constructed *inside* a jit/shard_map trace: operand groups may carry
    traced values. Call :meth:`run` once per pass.

    Args:
      arrays: example cell pytree of the pass INPUT block —
        ``(Hs, Ws)`` leaves (clamped mode: the row-padded carry;
        extended mode: the halo-extended local block, ``Hs = h + 2*hpm``).
      grid_range: logical grid extent ``(H, W)`` for coordinate semantics.
      mode: ``"clamped"`` (windows clip at the carry edges, output is
        carry-shaped) or ``"extended"`` (the input carries ``hpm`` stored
        halo rows top+bottom, windows never clip, output is core-only,
        ``Hs - 2*hpm`` rows).
      base_origin: global row of input row 0 (traced scalar ok; clamped
        mode passes 0). Column origin is always 0 (full-width strips).
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
        mode: str = "clamped",
        base_origin=0,
        col_halo: int = 0,
        base_col=0,
        unroll: int = 1,
        shift_impl: str = "concat",
        licm: bool = False,
        interpret: bool = False,
        force_partial: bool = False,
    ):
        H, W = grid_range
        Hs, Ws = jax.tree.leaves(arrays)[0].shape
        r, k, p = radius, n_subiterations, iters_per_pass
        # Mosaic's fori_loop lowering only supports unroll == num_steps or
        # unroll == 1; any unroll > 1 means "fully unroll the step loop", so
        # track the RESOLVED p (pick_config may have clamped the requested
        # iters_per_pass — e.g. the 1-iteration full pass of the convection
        # lean/full split under a tuned unroll=16 must not crash; that
        # downward tracking is documented and silent). A PARTIAL unroll
        # request (1 < unroll < p) is different: it gets silently *raised*
        # to full unroll, changing codegen vs what was tuned — warn, like
        # the linecache/transpose downgrades do (ADVICE r4 #3).
        if 1 < unroll < p:
            import warnings

            warnings.warn(
                f"Mosaic supports only unroll=1 or full unroll; requested "
                f"partial unroll={unroll} is coerced to the resolved "
                f"iters_per_pass={p}",
                RuntimeWarning,
                stacklevel=3,
            )
        if unroll != 1:
            unroll = p
        m = cell_sublane_multiple(arrays)
        hp = halo_width(r, p, k)
        hpm = round_up(hp, m)
        self.mode = mode
        self.interpret = interpret
        self.hpm = hpm
        self.m = m
        # Stored column halo (2D-mesh extended mode): the input block carries
        # ``col_halo`` lane-aligned columns per side from the mesh neighbors;
        # the output drops them. Zero for clamped mode and 1D row sharding
        # (full-width strips — the lane dim never needs a halo there).
        assert col_halo == 0 or mode == "extended", "col_halo is extended-only"
        chm = col_halo
        Wc = Ws - 2 * chm
        self.chm, self.Wc = chm, Wc

        if mode == "clamped":
            T = max(strip_rows, hpm)
            win_rows = T + 2 * hpm
            assert Hs >= win_rows, (Hs, T, win_rows)
            # T need not divide Hs: both input windows AND output blocks are
            # element-indexed with clamped origins, so the last strip simply
            # overlaps its predecessor (both compute identical values for the
            # shared rows from the same pass input). This keeps the carry
            # free of strip-alignment padding rows, which in turn makes the
            # ``aligned`` mask-free fast path reachable for any strip size.
            n_strips = -(-Hs // T)
            out_rows = Hs
        else:
            core = Hs - 2 * hpm
            T = min(strip_rows, core)
            # extended windows index at i*T: T must divide the core rows.
            # Prefer the divisor CLOSEST to the requested strip — downward
            # search alone can collapse a tuned strip badly (e.g. 112 over a
            # 4096-row core degrades to 64 when 128 is available).
            T_down = T
            while core % T_down:
                T_down -= m
            T_down = max(T_down, m)
            T_up = T
            while T_up <= min(core, 2 * T) and core % T_up:
                T_up += m
            if core % T_up == 0 and (T_up - T) < (T - T_down):
                T = T_up
            else:
                T = T_down
            assert core % T == 0, (core, T)
            win_rows = T + 2 * hpm
            n_strips = core // T
            out_rows = core
        self.T, self.win_rows, self.n_strips, self.out_rows = T, win_rows, n_strips, out_rows

        # ``force_partial``: callers whose per-pass start varies by device
        # (the ring backend — a device's whole pass may fall past the target
        # on the last lap) need pass-through even when p divides n.
        has_partial = force_partial or (n_iterations % p) != 0
        aligned = mode == "clamped" and Hs == H and Ws == W

        def encode_store(a, like):
            return a.astype(jnp.int8) if like.dtype == jnp.bool_ else a

        def decode_store(a, like):
            return a.astype(jnp.bool_) if like.dtype == jnp.bool_ else a

        self._encode_store = encode_store
        self._decode_store = decode_store

        ktdv = KernelTDV(strategy, tf, tdv_aux, n_iterations)
        self.ktdv = ktdv

        offset0 = jnp.asarray(0, jnp.int32)

        def step_fn(
            window, tf, halo_cell, origin_row, origin_col, oog_mask, i_abs, active, tdv
        ):
            out, _, _ = fused_substep(
                window,
                tf,
                halo_cell,
                origin_row,
                origin_col,
                (H, W),
                i_abs,
                tdv,
                active if has_partial else True,
                radius=r,
                n_subiterations=k,
                row_mode="pad",
                col_mode="pad",
                oog_mask=False if aligned else oog_mask,
            )
            return out

        example_window = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct((win_rows, Ws), a.dtype), arrays
        )
        # Aligned windows never consult the mask: trace without the operand
        # (None flattens to no leaves) so no mask plumbing reaches the kernel.
        example_mask = (
            None if aligned else jax.ShapeDtypeStruct((win_rows, Ws), jnp.bool_)
        )
        i0 = jnp.asarray(0, jnp.int32)
        from . import fused as _fused

        _prev_impl = _fused.SHIFT_IMPL
        _fused.SHIFT_IMPL = shift_impl
        try:
            hoisted_step = HoistedFn(
                step_fn,
                example_window,
                tf,
                halo_cell,
                i0,
                i0,
                example_mask,
                i0,
                jnp.asarray(True),
                ktdv.example,
            )
        finally:
            _fused.SHIFT_IMPL = _prev_impl

        # Loop-invariant code motion: hoist every step eqn that depends only
        # on per-strip-invariant inputs (tf params, halo, origin, the oog
        # mask) out of the iteration loop — Mosaic does not CSE identical
        # coordinate-mask chains across unrolled sub-steps, so mask-heavy
        # kernels (convection) re-emit them per sub-step without this.
        self.licm = licm
        if licm:
            _parts = (
                example_window, tf, halo_cell, i0, i0, example_mask, i0,
                jnp.asarray(True), ktdv.example,
            )
            _sizes = [len(jax.tree.leaves(x)) for x in _parts]
            _starts = [sum(_sizes[:j]) for j in range(len(_sizes))]
            _vary_parts = (0, 6, 7, 8)  # window, i_abs, active, tdv
            varying_positions = [
                pos
                for j in _vary_parts
                for pos in range(_starts[j], _starts[j] + _sizes[j])
            ]
            licm_boundary = hoisted_step.licm_split(varying_positions)
            licm_bound_dtypes = [v.aval.dtype for v in licm_boundary]

        tf_ops = Operands(tf, vectors_as_refs=False)
        halo_ops = Operands(halo_cell)
        scal_example = (
            i0,
            offset0,
            jnp.asarray(base_origin, jnp.int32),
            jnp.asarray(base_col, jnp.int32),
        )
        scal_ops = Operands(scal_example)
        const_ops = Operands(hoisted_step.consts, vectors_as_refs=False)
        groups = (scal_ops, tf_ops, halo_ops, const_ops)
        counts = [len(g.values) for g in groups] + [len(ktdv.operands)]
        self._groups = groups

        n_fields = len(jax.tree.leaves(arrays))
        arrays_treedef = jax.tree.structure(arrays)
        dtypes = [a.dtype for a in jax.tree.leaves(arrays)]

        # Loop-INVARIANT cell fields: a fused-step output that is literally
        # its own window input in the jaxpr (e.g. HotSpot's power map,
        # FDTD's material coefficients) never changes across sub-steps.
        # Keep such fields out of the iteration-loop carry (read once,
        # closure-captured) and skip their HBM output write entirely — the
        # caller reuses the input array. This is the TPU analog of the
        # reference streaming the full cell but only *computing* active
        # fields; here it removes per-trip register copies and a write
        # stream per invariant field.
        win_invars = hoisted_step.jaxpr.invars[:n_fields]
        outvars = hoisted_step.jaxpr.outvars
        invariant = [o is iv for o, iv in zip(outvars, win_invars)]
        if all(invariant):
            invariant = [False] * n_fields  # degenerate; keep one output
        self.invariant = invariant
        vpos = [j for j, inv in enumerate(invariant) if not inv]
        self._vpos = vpos

        def window_origin(i):
            if mode == "clamped":
                return jnp.clip(i * T - hpm, 0, Hs - win_rows)
            return i * T

        def out_origin(i):
            if mode == "clamped":
                return jnp.minimum(i * T, out_rows - T)
            return i * T

        if mode == "clamped":
            _w_os = [max(0, min(i * T - hpm, Hs - win_rows)) for i in range(n_strips)]
            _o_os = [min(i * T, out_rows - T) for i in range(n_strips)]
            core_specials = [
                (i, o - w)
                for i, (o, w) in enumerate(zip(_o_os, _w_os))
                if o - w != hpm
            ]
        else:
            core_specials = []

        def kernel(*refs):
            it = iter(refs)
            parts = [[next(it) for _ in range(c)] for c in counts]
            win_refs = [next(it) for _ in range(n_fields)]
            out_refs = list(it)
            i_start_v, offset_v, base_origin_v, base_col_v = scal_ops.decode(parts[0])
            tf_v = tf_ops.decode(parts[1])
            halo_v = halo_ops.decode(parts[2])
            consts_v = const_ops.decode(parts[3])
            tdv_decoded = ktdv.decode(parts[4])

            i = pl.program_id(0)
            origin_row = base_origin_v + jnp.asarray(window_origin(i), jnp.int32)
            window_stored = [wr[:] for wr in win_refs]
            if aligned:
                # Window rows/cols all in-grid and window edges coincide with
                # grid edges: no out-of-grid mask exists at all.
                oog = oog8 = None
            else:
                # Loop-invariant out-of-grid mask (columns span the full
                # width, so only the row coordinate and storage col padding
                # matter). int8 across the loop boundary: Mosaic miscompiles
                # bool carries.
                wrow = (
                    lax.broadcasted_iota(jnp.int32, (win_rows, Ws), 0) + origin_row
                )
                oog = wrow >= H
                if mode == "extended":
                    oog = oog | (wrow < 0)
                if W != Ws or chm:
                    wcol = (
                        lax.broadcasted_iota(jnp.int32, (win_rows, Ws), 1)
                        + base_col_v
                    )
                    oog = oog | (wcol >= W)
                    if mode == "extended":
                        oog = oog | (wcol < 0)
                # int8 at the loop-body boundary: Mosaic miscompiles bool
                # values crossing fori scopes.
                oog8 = oog.astype(jnp.int8)

            if mode == "extended":
                # Mesh-edge halos arrive as ppermute zeros: out-of-grid
                # positions must present the halo value from the FIRST
                # sub-step (the re-mask inside fused_substep only maintains
                # it afterwards). Clamped mode stores hv in its padding rows
                # and needs no entry mask.
                halo_stored = [
                    jnp.asarray(
                        hv, jnp.int8 if dt == jnp.bool_ else dt
                    )
                    for hv, dt in zip(jax.tree.leaves(halo_v), dtypes)
                ]
                window_stored = [
                    jnp.where(oog, hv, l)
                    for l, hv in zip(window_stored, halo_stored)
                ]

            # Invariant fields ride the closure (read once, never carried).
            inv_stored = {j: window_stored[j] for j in range(n_fields) if invariant[j]}

            if licm:
                # Evaluate the invariant prefix ONCE per strip; the boundary
                # values ride the closure into the step loop (bools as int8 —
                # Mosaic miscompiles bool values crossing fori scopes).
                # Varying args (window/i_abs/active/tdv) are placeholders the
                # prefix provably never reads.
                _placeholder_window = jax.tree.unflatten(
                    arrays_treedef, window_stored
                )
                licm_vals = hoisted_step.run_prefix(
                    _placeholder_window,
                    tf_v,
                    halo_v,
                    origin_row,
                    base_col_v,
                    None if aligned else oog8.astype(jnp.bool_),
                    jnp.asarray(0, jnp.int32),
                    jnp.asarray(True),
                    ktdv.example,
                    consts=consts_v,
                )
                licm_enc = [
                    v.astype(jnp.int8) if v.dtype == jnp.bool_ else v
                    for v in licm_vals
                ]

            def step_body(s, vleaves):
                i_abs = i_start_v + s
                if has_partial:
                    i_rel = lax.max(0, lax.min(i_abs - offset_v, n_iterations - 1))
                else:
                    i_rel = i_abs - offset_v
                tdv = ktdv.lookup(tdv_decoded, tf_v, i_rel, i_abs)
                stored_all = list(vleaves)
                for j, v in inv_stored.items():
                    stored_all.insert(j, v)
                window = jax.tree.unflatten(
                    arrays_treedef,
                    [
                        l.astype(jnp.bool_) if dt == jnp.bool_ else l
                        for l, dt in zip(stored_all, dtypes)
                    ],
                )
                step_args = (
                    window,
                    tf_v,
                    halo_v,
                    origin_row,
                    base_col_v,
                    None if aligned else oog8.astype(jnp.bool_),
                    jnp.asarray(i_abs, jnp.int32),
                    i_abs < offset_v + n_iterations,
                    tdv,
                )
                if licm:
                    bvals = [
                        v.astype(jnp.bool_) if dt == jnp.bool_ else v
                        for v, dt in zip(licm_enc, licm_bound_dtypes)
                    ]
                    w = hoisted_step.run_body(
                        *step_args, consts=consts_v, boundary_vals=bvals
                    )
                else:
                    w = hoisted_step(*step_args, consts=consts_v)
                out_leaves = jax.tree.leaves(w)
                return [
                    out_leaves[j].astype(jnp.int8)
                    if dtypes[j] == jnp.bool_
                    else out_leaves[j]
                    for j in vpos
                ]

            leaves = lax.fori_loop(
                0, p, step_body, [window_stored[j] for j in vpos], unroll=unroll
            )

            # Core extraction. Clamped mode: the window-relative core offset
            # is out_origin(i) - window_origin(i) — a STATIC per-strip value
            # (both origins are static functions of i). Mosaic has no dynamic
            # value slicing: select among the static slices actually present
            # (at most 3 strips deviate from the interior offset hpm:
            # the top-clamped first strip and the output-/window-clamped last
            # one or two) — measured FASTER than pl.when-predicated writes,
            # which stall the output pipeline. Extended mode: always hpm
            # (windows never clamp).
            def pick_core(a):
                if mode == "extended":
                    return lax.slice(a, (hpm, chm), (hpm + T, chm + Wc))
                base = lax.slice(a, (hpm, 0), (hpm + T, Ws))
                for idx, off in core_specials:
                    base = jnp.where(
                        i == idx, lax.slice(a, (off, 0), (off + T, Ws)), base
                    )
                return base

            for ref, leaf in zip(out_refs, leaves):
                ref[:] = pick_core(leaf)

        self._kernel = kernel
        self._win_spec = pl.BlockSpec(
            (pl.Element(win_rows), pl.Element(Ws)),
            lambda i: (pl.multiple_of(window_origin(i), m), 0),
            memory_space=pltpu.VMEM,
        )
        if mode == "clamped" and out_rows % T != 0:
            # Element-indexed clamped output blocks: the last strip's block
            # overlaps its predecessor when T does not divide Hs (identical
            # values are written to the shared rows). When T divides Hs the
            # plain blocked spec below is equivalent and pipelines better.
            self._out_spec = pl.BlockSpec(
                (pl.Element(T), pl.Element(Ws)),
                lambda i: (pl.multiple_of(out_origin(i), m), 0),
                memory_space=pltpu.VMEM,
            )
        else:
            self._out_spec = pl.BlockSpec(
                (T, Wc), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        self._n_fields = n_fields
        self._Ws = Ws
        self._arrays_treedef = arrays_treedef
        self._dtypes = dtypes
        window_bytes = win_rows * cell_row_bytes(arrays)
        self._vmem_limit = min(int(window_bytes * 8) + (1 << 25), 120 * (1 << 20))

    def run(self, arrays, i_start, offset, base_origin=0, base_col=0):
        """One pass of ``iters_per_pass`` fused iterations.

        ``arrays``: input block (store-encoded dtypes handled internally).
        Returns the output block: clamped mode — same shape as the input;
        extended mode — the core rows/cols only (stored halo stripped).
        """
        scal_ops, tf_ops, halo_ops, const_ops = self._groups
        scal_vals = Operands(
            (
                jnp.asarray(i_start, jnp.int32),
                jnp.asarray(offset, jnp.int32),
                jnp.asarray(base_origin, jnp.int32),
                jnp.asarray(base_col, jnp.int32),
            )
        ).values
        in_leaves = jax.tree.leaves(arrays)
        stored = [self._encode_store(a, a) for a in in_leaves]
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
                jax.ShapeDtypeStruct((self.out_rows, self.Wc), stored[j].dtype)
                for j in vpos
            ],
            # Strips within a pass are independent: inputs are read-only
            # overlapping windows of the pass INPUT, and strip results never
            # feed each other. "parallel" lets Mosaic schedule the strip
            # DMAs more aggressively (+1% measured on jacobi 8192^2).
            # DOCUMENTED ASSUMPTION (advisor r2): when T does not divide the
            # clamped output rows, the last strip's output block overlaps
            # its predecessor's with IDENTICAL values (both computed from
            # the same read-only pass input), so any execution order — or
            # even a concurrent write — stores the same bytes. v5e executes
            # grid steps sequentially on one core; a port to a
            # megacore-partitioned TPU generation must re-evaluate this
            # (switch the T-not-dividing case to "arbitrary" there).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=self._vmem_limit,
                dimension_semantics=("parallel",),
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
        # Reassemble: variant fields from the kernel, invariant fields pass
        # through untouched (clamped: the input IS the output; extended:
        # strip the stored halo rows).
        outs = iter(outs)
        leaves = []
        for j, a in enumerate(in_leaves):
            if self.invariant[j]:
                if self.mode == "extended":
                    a = lax.slice(
                        a,
                        (self.hpm, self.chm),
                        (self.hpm + self.out_rows, self.chm + self.Wc),
                    )
                leaves.append(a)
            else:
                leaves.append(
                    self._decode_store(next(outs), jnp.zeros((), self._dtypes[j]))
                )
        return jax.tree.unflatten(self._arrays_treedef, leaves)
