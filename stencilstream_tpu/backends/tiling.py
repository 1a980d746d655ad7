"""Tiling backend: temporal blocking over full-width row strips, any grid size.

TPU-native analog of the reference's tiling FPGA backend
(``StencilStream/tiling/StencilUpdate.hpp:69``): grids too large for on-chip
residency are cut into overlapping windows that stream through a fused
multi-iteration update, trading redundant halo compute for a ``p``-fold cut
in global-memory traffic.

Where the reference tiles in both dimensions with a compound halo of
``r * p * n_subiterations`` per side (``tiling/internal/StencilUpdateKernel.hpp:79-91``),
the TPU-native decomposition is **full-width row strips**: the lane (minor)
dimension stays contiguous — sequential HBM streams, no lane-dim halo
overhead — and only the sublane (row) dimension carries the compound halo.
This mirrors the reference's own best configurations, which use maximally
tall tiles for the same reason (``examples/hotspot/hotspot.cpp:120-127``,
tile 2^16 x 4096). Each Pallas grid step processes one strip:

* input: an *overlapping* window of ``strip_rows + 2*halo`` rows
  (element-indexed BlockSpec with a clamped, alignment-hinted offset),
  double-buffered by the Pallas pipeline — the analog of the reference's
  ``HaloTiledInputKernel`` (``tiling/internal/HaloTiledInputKernel.hpp:36``);
* compute: ``p * n_subiterations`` fused sub-steps at fixed window size with
  per-step halo re-masking (:mod:`.fused` pad/pad discipline). Rows within
  ``r*(steps so far)`` of an *interior* window edge go stale and are
  discarded with the margins — the overlapped-tiling trade; rows at *grid*
  edges stay exact because the mask injects the true boundary condition.
  Cells past the target iteration pass through unchanged (partial passes,
  ``StencilUpdateKernel.hpp:300-310``);
* output: the strip core, extracted at a window-dependent offset (edge
  strips have clamped windows) and written through a plain blocked spec.

The multi-pass loop (``ceil(n / p)`` passes, double-buffered grids,
``tiling/StencilUpdate.hpp:216-247``) runs as a ``lax.fori_loop`` over the
row-padded carry, so the whole update is one XLA computation.

Grids that fit the monotile VMEM budget should prefer the monotile backend
(zero redundant compute); this backend exists for everything bigger, exactly
like the reference pairing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.grid import Grid
from ..tdv import PrecomputeOnDeviceTDV
from .base import StencilUpdateBase, resolve_halo
from .fused import fused_substep, halo_width
from .pallas_util import (
    HoistedFn,
    KernelTDV,
    Operands,
    round_up,
    should_interpret,
    sublane_multiple,
)

__all__ = ["StencilUpdate", "TILING_VMEM_BUDGET"]

#: VMEM working budget for one strip window (with Pallas double buffering).
TILING_VMEM_BUDGET = 96 * 1024 * 1024


def _cell_sublane_multiple(arrays) -> int:
    m = 8
    for a in jax.tree.leaves(arrays):
        dt = jnp.int8 if a.dtype == jnp.bool_ else a.dtype
        m = max(m, sublane_multiple(dt))
    return m


def _cell_row_bytes(arrays) -> int:
    leaves = jax.tree.leaves(arrays)
    width = leaves[0].shape[1]
    return sum(
        width
        * max(jnp.dtype(jnp.int8 if a.dtype == jnp.bool_ else a.dtype).itemsize, 1)
        for a in leaves
    )


def pick_config(
    arrays,
    radius: int,
    n_subiterations: int,
    n_iterations: int,
    strip_rows: int | None,
    iters_per_pass: int | None,
) -> tuple[int, int]:
    """Choose (strip_rows, iters_per_pass) — the analog of the reference's
    per-app tuned ``{temporal_parallelism, tile size}`` tables
    (``examples/jacobi/kernels.hpp:236-253``)."""
    H, _ = jax.tree.leaves(arrays)[0].shape
    m = _cell_sublane_multiple(arrays)
    row_bytes = _cell_row_bytes(arrays)

    if strip_rows is None:
        # The kernel's VMEM working set is ~16 window-sized buffers (2+2
        # pipeline buffers plus Mosaic-materialized sub-step temporaries —
        # observed empirically from vmem OOM reports). Size the window to
        # fit, within [m, 1024] core rows.
        target_win = max(m, min(1024, (TILING_VMEM_BUDGET // 16) // max(row_bytes, 1)))
        strip_rows = max(m, (target_win * 2 // 3 // m) * m)  # ~1/3 halo margin
    strip_rows = min(round_up(strip_rows, m), round_up(H, m))

    if iters_per_pass is None:
        # Halo overhead 2*r*p*k <= strip_rows/2  =>  ~33% redundant rows.
        iters_per_pass = max(1, strip_rows // (4 * radius * n_subiterations))
    if n_iterations:
        iters_per_pass = min(iters_per_pass, n_iterations)
    return strip_rows, iters_per_pass


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius",
        "n_subiterations",
        "n_iterations",
        "strategy",
        "strip_rows",
        "iters_per_pass",
        "interpret",
        "unroll",
        "shift_impl",
        "logical_w",
    ),
)
def _run_tiling(
    arrays,
    tf,
    halo_cell,
    offset,
    tdv_aux,
    *,
    radius: int,
    n_subiterations: int,
    n_iterations: int,
    strategy,
    strip_rows: int,
    iters_per_pass: int,
    interpret: bool,
    unroll: int = 1,
    shift_impl: str = "concat",
    logical_w: int | None = None,
):
    if n_iterations == 0:
        return arrays

    if isinstance(strategy, PrecomputeOnDeviceTDV):
        tdv_aux = strategy.precompute_traced(tf, offset, n_iterations)

    H, Ws = jax.tree.leaves(arrays)[0].shape
    W = logical_w if logical_w is not None else Ws
    r, k, p = radius, n_subiterations, iters_per_pass
    m = _cell_sublane_multiple(arrays)
    T = strip_rows
    hp = halo_width(r, p, k)
    hpm = round_up(hp, m)  # window margin, aligned for element offsets
    # Interior strips must never clamp (the core offset then takes exactly
    # three static values: 0, hpm, 2*hpm).
    T = max(T, hpm)
    win_rows = T + 2 * hpm
    # Carry rows: multiple of T (blocked output) and >= one full window.
    Hs = round_up(max(H, win_rows), T)
    n_strips = Hs // T
    n_passes = -(-n_iterations // p)
    offset = jnp.asarray(offset, jnp.int32)
    i_target = offset + n_iterations

    def encode_store(a, like):
        return a.astype(jnp.int8) if like.dtype == jnp.bool_ else a

    def decode_store(a, like):
        return a.astype(jnp.bool_) if like.dtype == jnp.bool_ else a

    halo_store = jax.tree.map(
        lambda hv, a: jnp.asarray(hv, jnp.int8 if a.dtype == jnp.bool_ else a.dtype),
        halo_cell,
        arrays,
    )
    # Row-padded carry (no halo frame needed: out-of-grid coordinates are
    # re-masked inside the kernel every sub-step).
    padded = jax.tree.map(
        lambda a, hv: jnp.pad(
            encode_store(a, a), ((0, Hs - H), (0, 0)), constant_values=hv
        ),
        arrays,
        halo_store,
    )

    def window_origin(i):
        return jnp.clip(i * T - hpm, 0, Hs - win_rows)

    def window_decode(w):
        return jax.tree.map(decode_store, w, arrays)

    def window_encode(w):
        return jax.tree.map(encode_store, w, arrays)

    # Mosaic cannot dynamically index *values*, so the per-iteration TDV is
    # looked up in-kernel through refs / a hoisted inline call, and the
    # hoisted step takes it as an argument.
    ktdv = KernelTDV(strategy, tf, tdv_aux, n_iterations)

    # Static specializations: aligned grids (Hs == H) have no out-of-grid
    # rows — the halo re-mask select drops out; when n divides evenly into
    # passes, every pass is full — the pass-through select drops out.
    aligned = Hs == H and Ws == W
    has_partial = (n_iterations % p) != 0

    def step_fn(window, tf, halo_cell, origin_row, oog_mask, i_abs, tdv):
        out, _, _ = fused_substep(
            window,
            tf,
            halo_cell,
            origin_row,
            jnp.asarray(0, jnp.int32),
            (H, W),
            i_abs,
            tdv,
            (i_abs < i_target) if has_partial else True,
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
    example_mask = jax.ShapeDtypeStruct((win_rows, Ws), jnp.bool_)
    i0 = jnp.asarray(0, jnp.int32)
    from . import fused as _fused

    _prev_impl = _fused.SHIFT_IMPL
    _fused.SHIFT_IMPL = shift_impl
    try:
        hoisted_step = HoistedFn(
            step_fn, example_window, tf, halo_cell, i0, example_mask, i0, ktdv.example
        )
    finally:
        _fused.SHIFT_IMPL = _prev_impl

    tf_ops = Operands(tf, vectors_as_refs=False)
    halo_ops = Operands(halo_cell)
    scal_ops = Operands((i0, offset))
    const_ops = Operands(hoisted_step.consts, vectors_as_refs=False)
    groups = (scal_ops, tf_ops, halo_ops, const_ops)
    counts = [len(g.values) for g in groups] + [len(ktdv.operands)]

    n_fields = len(jax.tree.leaves(padded))
    store_treedef = jax.tree.structure(padded)

    def kernel(*refs):
        it = iter(refs)
        parts = [[next(it) for _ in range(c)] for c in counts]
        win_refs = [next(it) for _ in range(n_fields)]
        out_refs = list(it)
        i_start_v, offset_v = scal_ops.decode(parts[0])
        tf_v = tf_ops.decode(parts[1])
        halo_v = halo_ops.decode(parts[2])
        consts_v = const_ops.decode(parts[3])
        tdv_decoded = ktdv.decode(parts[4])

        i = pl.program_id(0)
        origin_row = jnp.asarray(window_origin(i), jnp.int32)
        window_stored = jax.tree.unflatten(
            store_treedef, [wr[:] for wr in win_refs]
        )
        # Loop-invariant out-of-grid mask (grid cols span the full width, so
        # only the row coordinate matters). int8, not bool: Mosaic
        # miscompiles bool fori carries, so everything crossing the loop
        # boundary rides in integer form.
        wrow = lax.broadcasted_iota(jnp.int32, (win_rows, Ws), 0) + origin_row
        oog = wrow >= H
        if W != Ws:
            wcol = lax.broadcasted_iota(jnp.int32, (win_rows, Ws), 1)
            oog = oog | (wcol >= W)
        oog8 = oog.astype(jnp.int8)

        arrays_treedef = jax.tree.structure(arrays)

        def step_body(s, leaves):
            i_abs = i_start_v + s
            if has_partial:
                i_rel = lax.max(0, lax.min(i_abs - offset_v, n_iterations - 1))
            else:
                i_rel = i_abs - offset_v
            tdv = ktdv.lookup(tdv_decoded, tf_v, i_rel, i_abs)
            w = hoisted_step(
                window_decode(jax.tree.unflatten(arrays_treedef, leaves)),
                tf_v,
                halo_v,
                origin_row,
                oog8.astype(jnp.bool_),
                jnp.asarray(i_abs, jnp.int32),
                tdv,
                consts=consts_v,
            )
            return jax.tree.leaves(window_encode(w))

        leaves = lax.fori_loop(
            0, p, step_body, jax.tree.leaves(window_stored), unroll=unroll
        )
        out = jax.tree.unflatten(arrays_treedef, leaves)

        # Core extraction. The window-relative core offset is i*T - origin:
        # 0 for a top-clamped window, 2*hpm for a bottom-clamped one, hpm
        # otherwise (hpm <= T guarantees only edge strips clamp). Mosaic has
        # no dynamic value slicing, so select among the three static slices.
        def pick_core(a):
            s_first = lax.slice(a, (0, 0), (T, Ws))
            s_mid = lax.slice(a, (hpm, 0), (hpm + T, Ws))
            s_last = lax.slice(a, (2 * hpm, 0), (2 * hpm + T, Ws))
            return jnp.where(
                i == 0, s_first, jnp.where(i == n_strips - 1, s_last, s_mid)
            )

        for ref, leaf in zip(out_refs, jax.tree.leaves(out)):
            ref[:] = pick_core(leaf)

    win_spec = pl.BlockSpec(
        (pl.Element(win_rows), pl.Element(Ws)),
        lambda i: (pl.multiple_of(window_origin(i), m), 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec((T, Ws), lambda i: (i, 0), memory_space=pltpu.VMEM)

    window_bytes = win_rows * _cell_row_bytes(arrays)

    def pass_body(i_pass, padded):
        i_start = offset + i_pass * p
        scal_vals = Operands((jnp.asarray(i_start, jnp.int32), offset)).values
        outs = pl.pallas_call(
            kernel,
            grid=(n_strips,),
            in_specs=(
                list(scal_ops.specs)
                + [s for g in groups[1:] for s in g.specs]
                + list(ktdv.specs)
                + [win_spec] * n_fields
            ),
            out_specs=[out_spec] * n_fields,
            out_shape=[
                jax.ShapeDtypeStruct((Hs, Ws), a.dtype)
                for a in jax.tree.leaves(padded)
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    int(window_bytes * 8) + (1 << 25), 120 * (1 << 20)
                ),
            ),
            interpret=interpret,
        )(
            *scal_vals,
            *[v for g in groups[1:] for v in g.values],
            *ktdv.operands,
            *jax.tree.leaves(padded),
        )
        return jax.tree.unflatten(store_treedef, outs)

    padded = lax.fori_loop(0, n_passes, pass_body, padded)
    return jax.tree.map(
        lambda a, like: decode_store(lax.slice(a, (0, 0), (H, Ws)), like),
        padded,
        arrays,
    )



def _narrow_grid(grid: Grid) -> bool:
    """Grids narrower than one vreg lane tile can't utilize the VPU and
    trigger pathological Mosaic compiles (docs/DESIGN.md); run them through
    the XLA oracle on hardware instead."""
    import jax

    return grid.width < 128 and jax.default_backend() == "tpu"


class StencilUpdate(StencilUpdateBase):
    """Tiling (strip temporal-blocking) stencil updater.

    Extra keyword options (the analog of the reference's tuned template
    parameters, ``tiling/StencilUpdate.hpp:69-80``):

    * ``strip_rows`` — core rows per strip (auto: sized to the VMEM budget).
    * ``iters_per_pass`` — temporal parallelism p, iterations fused per HBM
      round trip (auto: ~33% halo overhead).
    * ``interpret`` — force Pallas interpreter mode (auto: off-TPU only).
    """

    _can_fallback = True

    def __init__(
        self,
        params,
        *,
        strip_rows: int | None = None,
        iters_per_pass: int | None = None,
        interpret: bool | None = None,
        unroll: int = 1,
        shift_impl: str = "concat",
    ):
        super().__init__(params)
        self.strip_rows = strip_rows
        self.iters_per_pass = iters_per_pass
        self.interpret = interpret
        self.unroll = unroll
        self.shift_impl = shift_impl

    def _update(self, grid: Grid) -> Grid:
        if self.interpret is not True and _narrow_grid(grid):
            from . import reference

            ref = reference.StencilUpdate(self.params)
            return ref._update(grid)
        p = self.params
        tf = p.transition_function
        strategy = self._tdv_strategy()
        halo_cell = resolve_halo(p.halo_value, grid)
        n = int(p.n_iterations)

        strip_rows, iters_per_pass = pick_config(
            grid.arrays,
            tf.stencil_radius,
            tf.n_subiterations,
            n,
            self.strip_rows,
            self.iters_per_pass,
        )
        offset = jnp.asarray(p.iteration_offset, jnp.int32)
        tdv_aux = strategy.prepare(tf, int(p.iteration_offset), n)
        interpret = (
            self.interpret if self.interpret is not None else should_interpret()
        )
        # Align the lane dim to hardware tiles (unaligned widths make Mosaic
        # emit catastrophically slow code); logical width drives semantics.
        H, W = grid.shape
        Ws = round_up(W, 128)
        arrays = grid.arrays
        if Ws != W:
            halo_typed = jax.tree.map(
                lambda hv, a: jnp.asarray(hv, a.dtype), halo_cell, arrays
            )
            arrays = jax.tree.map(
                lambda a, hv: jnp.pad(a, ((0, 0), (0, Ws - W)), constant_values=hv),
                arrays,
                halo_typed,
            )
        out = _run_tiling(
            arrays,
            tf,
            halo_cell,
            offset,
            tdv_aux,
            radius=tf.stencil_radius,
            n_subiterations=tf.n_subiterations,
            n_iterations=n,
            strategy=strategy,
            strip_rows=strip_rows,
            iters_per_pass=iters_per_pass,
            interpret=interpret,
            unroll=self.unroll,
            shift_impl=self.shift_impl,
            logical_w=W,
        )
        if Ws != W:
            out = jax.tree.map(lambda a: a[:, :W], out)
        return Grid(out)
