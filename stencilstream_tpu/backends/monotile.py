"""Monotile backend: one fused Pallas kernel, grid resident in VMEM.

TPU-native analog of the reference's flagship FPGA backend
(``StencilStream/monotile/internal/StencilUpdateKernel.hpp:65``): where the
FPGA streams the grid through a chain of ``p * n_subiterations`` processing
elements (temporal blocking, p iterations per global-memory round trip), the
TPU keeps the *whole grid in VMEM* and runs **all** iterations of a call in one
``pallas_call`` — a single HBM round trip for the entire update, the logical
limit of temporal blocking (effective p = n_iterations).

Mapping of the reference's design elements:

* line cache + shift-register window (``StencilUpdateKernel.hpp:180-186``) →
  the VMEM-resident field arrays themselves; neighbor access is a static
  slice of a halo-padded copy, vectorized across all lanes by Mosaic.
* halo masking from global coords (``StencilUpdateKernel.hpp:259-303``) → the
  constant-value pad itself (window == grid, so pad == grid boundary).
* pass-through for partial passes (:250-256) → unnecessary: the iteration
  count is exact, no pipeline padding exists.
* ``max_grid_height/width`` template params sizing on-chip buffers
  (``monotile/StencilUpdate.hpp:78-84``) → the VMEM capacity check in
  :meth:`StencilUpdate._update`.
* TDV strategies (``tdv/SinglePassStrategies.hpp``) → inline TDV is traced
  into the kernel; precomputed TDV arrays ride along as SMEM/VMEM operands.

Cells are pytrees; every leaf array lives in VMEM for the whole run. Scalar
runtime parameters (transition-function fields, halo cell, iteration offset)
are SMEM operands, so mutating them between calls never recompiles.
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
from .pallas_util import HoistedFn, KernelTDV, Operands, should_interpret
from .reference import single_subiteration

__all__ = ["StencilUpdate", "MONOTILE_VMEM_BUDGET", "monotile_live_bytes"]

#: VMEM budget (bytes) for grid residency; grids needing more must use the
#: tiling backend (the analog of exceeding ``max_grid_height x max_grid_width``,
#: ``monotile/StencilUpdate.hpp:200-209``).
MONOTILE_VMEM_BUDGET = 96 * 1024 * 1024


def monotile_live_bytes(arrays) -> int:
    """Estimated VMEM live set for a resident grid: ~6 grid-sized buffers
    (in/out plus Mosaic-materialized sub-step temporaries, observed
    empirically). The capacity check and ``backend="auto"`` both use this."""
    grid_bytes = sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(arrays))
    return grid_bytes * 6


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius",
        "n_subiterations",
        "n_iterations",
        "strategy",
        "interpret",
        "unroll",
        "shift_impl",
        "grid_range",
        "vmem_budget",
    ),
)
def _run_monotile(
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
    interpret: bool,
    unroll: int,
    shift_impl: str = "concat",
    grid_range: tuple[int, int] | None = None,
    vmem_budget: int | None = None,
):
    if n_iterations == 0:
        return arrays

    # Precompute-on-device runs as traced XLA ahead of the kernel — same
    # device-side semantics as ``tdv/SinglePassStrategies.hpp:155-192``.
    if isinstance(strategy, PrecomputeOnDeviceTDV):
        tdv_aux = strategy.precompute_traced(tf, offset, n_iterations)

    offset = jnp.asarray(offset, jnp.int32)
    # Mosaic cannot dynamically index *values*, so the per-iteration TDV is
    # looked up in-kernel through refs / a hoisted inline call.
    ktdv = KernelTDV(strategy, tf, tdv_aux, n_iterations)

    # Storage may be padded up to hardware-tile multiples (Mosaic code for
    # unaligned lane dims is catastrophically slow); the logical grid extent
    # drives coordinate semantics and the out-of-grid re-mask.
    Hs, Ws = jax.tree.leaves(arrays)[0].shape
    H, W = grid_range if grid_range is not None else (Hs, Ws)
    aligned = (H, W) == (Hs, Ws)

    def step_fn(arrays, tf, halo_cell, i_abs, tdv):
        for sub in range(n_subiterations):
            arrays = single_subiteration(
                arrays, tf, halo_cell, i_abs, sub, tdv,
                radius=radius, grid_range=(H, W),
            )
            if not aligned:
                row = lax.broadcasted_iota(jnp.int32, (Hs, Ws), 0)
                col = lax.broadcasted_iota(jnp.int32, (Hs, Ws), 1)
                oog = (row >= H) | (col >= W)
                arrays = jax.tree.map(
                    lambda a, hv: jnp.where(oog, jnp.asarray(hv, a.dtype), a),
                    arrays,
                    halo_cell,
                )
        return arrays

    # Transition functions freely capture jnp constants (coefficient tables,
    # LUT arrays, module-level constants...). Pallas kernels may not close
    # over array constants, so hoist them into explicit operands.
    from . import fused as _fused

    _prev_impl = _fused.SHIFT_IMPL
    _fused.SHIFT_IMPL = shift_impl
    try:
        hoisted_step = HoistedFn(step_fn, arrays, tf, halo_cell, offset, ktdv.example)
    finally:
        _fused.SHIFT_IMPL = _prev_impl

    grid_ops = Operands(arrays)
    tf_ops = Operands(tf, vectors_as_refs=False)
    halo_ops = Operands(halo_cell)
    off_ops = Operands(offset)
    const_ops = Operands(hoisted_step.consts, vectors_as_refs=False)
    groups = (off_ops, grid_ops, tf_ops, halo_ops, const_ops)
    counts = [len(g.values) for g in groups] + [len(ktdv.operands)]
    grid_treedef = jax.tree.structure(arrays)

    # Loop-INVARIANT cell fields (a step output that is literally its own
    # grid input in the jaxpr, e.g. HotSpot's power map): keep them out of
    # the iteration-loop carry — read once, closure-captured — and write
    # their output as a single copy instead of dragging them through every
    # unrolled step (see strip_pass.StripPass for the tiling analog).
    n_fields = len(jax.tree.leaves(arrays))
    _win_invars = hoisted_step.jaxpr.invars[:n_fields]
    invariant = [o is iv for o, iv in zip(hoisted_step.jaxpr.outvars, _win_invars)]
    if all(invariant):
        invariant = [False] * n_fields
    vpos = [j for j, inv in enumerate(invariant) if not inv]

    def kernel(*refs):
        it = iter(refs)
        parts = [[next(it) for _ in range(c)] for c in counts]
        out_refs = list(it)
        offset_v = off_ops.decode(parts[0])
        arrays_v = grid_ops.decode(parts[1])
        tf_v = tf_ops.decode(parts[2])
        halo_v = halo_ops.decode(parts[3])
        consts_v = const_ops.decode(parts[4])
        tdv_decoded = ktdv.decode(parts[5])

        # Loop carries must not be bool (Mosaic miscompiles bool fori
        # carries); ride int8 and cast at the step boundary. Only VARIANT
        # fields are carried; invariant fields are closure-captured.
        all_leaves = jax.tree.leaves(arrays_v)

        def carry_encode(leaves):
            return [
                l.astype(jnp.int8) if grid_ops.dtypes[j] == jnp.bool_ else l
                for l, j in zip(leaves, vpos)
            ]

        def carry_decode(leaves):
            return [
                l.astype(jnp.bool_) if grid_ops.dtypes[j] == jnp.bool_ else l
                for l, j in zip(leaves, vpos)
            ]

        def merge_full(vleaves):
            full = list(vleaves)
            for j in range(n_fields):
                if invariant[j]:
                    full.insert(j, all_leaves[j])
            return full

        # Two-level-unroll bookkeeping must precede one_step: the overshoot
        # clamp is emitted only when it can actually trigger (jnp wrappers
        # nest an inner jit that deoptimizes the SMEM-indexed read).
        u = max(1, min(unroll or 1, n_iterations))
        n_outer = -(-n_iterations // u)
        has_partial = (n_iterations % u) != 0

        def one_step(i, leaves):
            i_abs = offset_v + i
            if has_partial:
                i_rel = lax.max(0, lax.min(i, n_iterations - 1))
            else:
                i_rel = i
            tdv = ktdv.lookup(tdv_decoded, tf_v, i_rel, i_abs)
            cur = hoisted_step(
                jax.tree.unflatten(grid_treedef, merge_full(carry_decode(leaves))),
                tf_v,
                halo_v,
                jnp.asarray(i_abs, jnp.int32),
                tdv,
                consts=consts_v,
            )
            out_leaves = jax.tree.leaves(cur)
            return carry_encode([out_leaves[j] for j in vpos])

        # Two-level loop: Mosaic supports only full unrolling of fori_loop,
        # so the unroll factor is realized as u inline steps per trip
        # (cross-substep CSE), with pass-through for the overshoot when
        # n % u != 0.
        def iter_body(o, leaves):
            for j in range(u):
                i = o * u + j
                new = one_step(i, leaves)
                if has_partial:
                    active = i < n_iterations
                    new = [jnp.where(active, nl, ol) for nl, ol in zip(new, leaves)]
                leaves = new
            return leaves

        leaves = carry_encode([all_leaves[j] for j in vpos])
        if n_outer <= 1:
            leaves = iter_body(0, leaves)
        else:
            leaves = lax.fori_loop(0, n_outer, iter_body, leaves)

        leaves = iter(leaves)
        for j, ref in enumerate(out_refs):
            if invariant[j]:
                v = all_leaves[j]
                ref[:] = v.astype(jnp.int8) if grid_ops.dtypes[j] == jnp.bool_ else v
            else:
                ref[:] = next(leaves)

    grid_bytes = sum(v.size * v.dtype.itemsize for v in grid_ops.values)
    out = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(v.shape, v.dtype) for v in grid_ops.values
        ],
        in_specs=[s for g in groups for s in g.specs] + list(ktdv.specs),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in grid_ops.values],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                (vmem_budget or MONOTILE_VMEM_BUDGET) + 16 * 1024 * 1024,
                max(32 * 1024 * 1024, int(grid_bytes * 6)),
            ),
        ),
        interpret=interpret,
    )(*[v for g in groups for v in g.values], *ktdv.operands)

    leaves = []
    for v, dt in zip(out, grid_ops.dtypes):
        leaves.append(v.astype(jnp.bool_) if dt == jnp.bool_ else v)
    return jax.tree.unflatten(grid_ops.treedef, leaves)



class StencilUpdate(StencilUpdateBase):
    """Monotile (VMEM-resident) stencil updater.

    Extra keyword options:

    * ``unroll`` — inline steps per loop trip of the in-kernel iteration
      loop (cross-substep CSE; overshoot handled by pass-through).
    * ``interpret`` — force Pallas interpreter mode (defaults to automatic:
      interpreted off-TPU so the backend is testable on the CPU mesh).
    * ``vmem_budget`` — overrides the residency capacity check AND the
      Pallas VMEM limit. The default law (~6 grid-sized buffers) is
      conservative for cells where most fields are loop-INVARIANT (read
      once, never carried): FDTD's 8-field cell has 4 invariant coefficient
      planes and measures 106 GCell/s monotile at 1024^2 with a 200 MiB
      budget (vs 79 tiling), while hotspot at 2048^2 (1 variant field of
      16 MiB) genuinely exhausts VMEM — override only after measuring.
    """

    _can_fallback = True

    def __init__(
        self,
        params,
        *,
        unroll: int = 0,
        interpret: bool | None = None,
        shift_impl: str = "concat",
        vmem_budget: int | None = None,
    ):
        super().__init__(params)
        self.unroll = unroll
        self.interpret = interpret
        self.shift_impl = shift_impl
        self.vmem_budget = vmem_budget

    def _update(self, grid: Grid) -> Grid:
        p = self.params
        tf = p.transition_function
        strategy = self._tdv_strategy()
        halo_cell = resolve_halo(p.halo_value, grid)
        n = int(p.n_iterations)

        # The kernel's live set is ~6 grid-sized buffers (in/out plus
        # Mosaic-materialized sub-step temporaries); beyond that VMEM
        # pressure makes the kernel catastrophically slow, so reject early —
        # like the reference's max-dims validation
        # (monotile/StencilUpdate.hpp:200-209).
        budget = self.vmem_budget or MONOTILE_VMEM_BUDGET
        if monotile_live_bytes(grid.arrays) > budget:
            grid_bytes = monotile_live_bytes(grid.arrays) // 6
            raise ValueError(
                f"grid needs ~{grid_bytes // (1024 * 1024)} MiB of cell data; "
                f"the monotile backend requires the whole grid resident in "
                f"VMEM (budget {budget // (1024 * 1024)} MiB). "
                f"Use the tiling backend for larger grids."
            )

        offset = jnp.asarray(p.iteration_offset, jnp.int32)
        tdv_aux = strategy.prepare(tf, int(p.iteration_offset), n)
        interpret = (
            self.interpret if self.interpret is not None else should_interpret()
        )
        # Align storage to hardware tiles (sublane x lane); unaligned lane
        # dims make Mosaic emit catastrophically slow code. The logical grid
        # extent still drives coordinate/halo semantics.
        H, W = grid.shape
        from .pallas_util import round_up

        Hs, Ws = round_up(H, 8), round_up(W, 128)
        arrays = grid.arrays
        if (Hs, Ws) != (H, W):
            halo_typed = jax.tree.map(
                lambda hv, a: jnp.asarray(hv, a.dtype), halo_cell, arrays
            )
            arrays = jax.tree.map(
                lambda a, hv: jnp.pad(
                    a, ((0, Hs - H), (0, Ws - W)), constant_values=hv
                ),
                arrays,
                halo_typed,
            )
        out = _run_monotile(
            arrays,
            tf,
            halo_cell,
            offset,
            tdv_aux,
            grid_range=(H, W),
            radius=tf.stencil_radius,
            n_subiterations=tf.n_subiterations,
            n_iterations=n,
            strategy=strategy,
            interpret=interpret,
            unroll=self.unroll,
            shift_impl=self.shift_impl,
            vmem_budget=self.vmem_budget,
        )
        if (Hs, Ws) != (H, W):
            out = jax.tree.map(lambda a: a[:H, :W], out)
        return Grid(out)
