"""Shared plumbing for the Pallas backends (monotile, tiling).

Handles the impedance between framework pytrees (cells, transition-function
parameters, halo cells, TDV streams) and Pallas kernel operands:

* scalars ride in SMEM as ``(1, 1)`` refs (bool as int32),
* short 1-D arrays (per-iteration TDV streams) ride in SMEM and are decoded
  to the *ref itself* so per-step ``ref[i]`` scalar reads stay cheap — the
  analog of the reference's ranged TDV accessor
  (``StencilStream/tdv/SinglePassStrategies.hpp:237-247``),
* everything else rides in VMEM (bool as int8, 1-D reshaped to 2-D).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "Operands",
    "should_interpret",
    "sublane_multiple",
    "round_up",
    "SMEM_VECTOR_LIMIT",
]

#: 1-D operands up to this many elements ride in SMEM.
SMEM_VECTOR_LIMIT = 16384


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def sublane_multiple(dtype) -> int:
    """Minimum second-to-last-dim tile multiple for a dtype on TPU
    ((8, 128) for 4-byte, (16, 128) for 2-byte, (32, 128) for 1-byte)."""
    itemsize = jnp.dtype(dtype).itemsize
    return max(8, 32 // max(itemsize, 1))


def _leaf_mode(leaf) -> str:
    a = jnp.asarray(leaf)
    if a.ndim == 0:
        return "smem_scalar"
    if a.ndim == 1 and a.shape[0] <= SMEM_VECTOR_LIMIT:
        return "smem_vector"
    return "vmem"


def _encode(leaf, mode: str):
    a = jnp.asarray(leaf)
    if mode == "smem_scalar":
        if a.dtype == jnp.bool_:
            a = a.astype(jnp.int32)
        return a.reshape(1, 1)
    if mode == "smem_vector":
        return a.astype(jnp.int32) if a.dtype == jnp.bool_ else a
    if a.dtype == jnp.bool_:
        a = a.astype(jnp.int8)
    if a.ndim == 1:
        a = a.reshape(a.shape[0], 1)
    return a


class Operands:
    """Flattens a pytree into Pallas operands + in_specs, and rebuilds the
    pytree from kernel refs (decoding the bool/rank transforms).

    ``smem_vector`` leaves decode to the ref itself — refs behave as pytree
    leaves under ``jax.tree.map``, so per-step indexing composes with the TDV
    strategies' generic ``a[i]`` lookups.
    """

    def __init__(self, tree: Any, vectors_as_refs: bool = True):
        leaves, self.treedef = jax.tree.flatten(tree)
        self.modes = [_leaf_mode(l) for l in leaves]
        if not vectors_as_refs:
            self.modes = ["vmem" if m == "smem_vector" else m for m in self.modes]
        self.dtypes = [jnp.asarray(l).dtype for l in leaves]
        self.ndims = [jnp.ndim(l) for l in leaves]
        self.values = [_encode(l, m) for l, m in zip(leaves, self.modes)]
        self.specs = [
            pl.BlockSpec(
                memory_space=pltpu.SMEM if m.startswith("smem") else pltpu.VMEM
            )
            for m in self.modes
        ]

    def __len__(self) -> int:
        return len(self.values)

    def decode(self, refs, as_refs: bool = False) -> Any:
        leaves = []
        for ref, m, dt, nd in zip(refs, self.modes, self.dtypes, self.ndims):
            if m == "smem_scalar":
                v = ref[0, 0]
                if dt == jnp.bool_:
                    v = v.astype(jnp.bool_)
            elif m == "smem_vector" or as_refs:
                v = ref  # indexed per step by consumers
            else:
                v = ref[:]
                if nd == 1:
                    v = v.reshape(v.shape[0])
                if dt == jnp.bool_:
                    v = v.astype(jnp.bool_)
            leaves.append(v)
        return jax.tree.unflatten(self.treedef, leaves)


def _live_eqns(jaxpr):
    """Dead-code-eliminated equation list (all jaxpr outputs considered
    live). ``eval_jaxpr``-style re-emission executes every equation, and
    Mosaic does not reliably DCE dead vector ops — lazily-built but unused
    neighbor fields would otherwise be materialized at full cost."""
    from jax.extend.core import Literal

    needed = {v for v in jaxpr.outvars if not isinstance(v, Literal)}
    live = []
    for eqn in reversed(jaxpr.eqns):
        if eqn.effects or any(v in needed for v in eqn.outvars):
            live.append(eqn)
            for v in eqn.invars:
                if not isinstance(v, Literal):
                    needed.add(v)
    live.reverse()
    return live


def _eval_jaxpr_tpu_safe(jaxpr, consts, *args, eqns=None, env0=None, outvars=None):
    """``core.eval_jaxpr`` with Mosaic-crash rewrites applied while
    re-emitting:

    * dead equations are skipped (:func:`_live_eqns`),
    * ``select_n`` on **bool** operands miscompiles (silent compiler crash);
      rewrite to mask logic ``(pred & t) | (~pred & f)``,
    * recurse into ``pjit``-wrapped sub-jaxprs so rewrites reach ops that
      jnp wraps in inner jits.

    ``env0`` seeds additional var bindings (LICM boundary values);
    ``outvars`` overrides which vars are read out (defaults to the jaxpr's).
    """
    from jax.extend.core import Literal

    env = dict(env0) if env0 else {}

    def read(v):
        return v.val if isinstance(v, Literal) else env[v]

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a
    for eqn in eqns if eqns is not None else _live_eqns(jaxpr):
        invals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        if (
            name == "select_n"
            and len(invals) == 3
            and eqn.outvars[0].aval.dtype == jnp.bool_
            and jnp.asarray(invals[0]).dtype == jnp.bool_
        ):
            pred, on_false, on_true = invals
            outs = [(pred & on_true) | (jnp.logical_not(pred) & on_false)]
        elif name in ("pjit", "jit", "closed_call", "custom_jvp_call", "custom_vjp_call") and hasattr(
            eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr"), "jaxpr"
        ):
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            outs = _eval_jaxpr_tpu_safe(sub.jaxpr, list(sub.consts), *invals)
        else:
            subfuns, bind_params = eqn.primitive.get_bind_params(eqn.params)
            outs = eqn.primitive.bind(*subfuns, *invals, **bind_params)
            if not eqn.primitive.multiple_results:
                outs = [outs]
        for v, o in zip(eqn.outvars, outs):
            env[v] = o
    return [read(v) for v in (jaxpr.outvars if outvars is None else outvars)]


class HoistedFn:
    """A function traced to a jaxpr with ALL closure constants hoisted.

    Pallas kernels may not capture array constants, but user transition
    functions are full of them (coefficient scalars, LUT tables, module-level
    ``jnp`` constants). ``jax.closure_convert`` hoists only *traced* captures;
    this hoists every jaxpr const — concrete or traced — so the function can
    be re-emitted inside a kernel with the consts fed through operands.
    Re-emission also applies Mosaic-workaround rewrites
    (:func:`_eval_jaxpr_tpu_safe`).

    Usage::

        hf = HoistedFn(fn, *example_args)     # outside the kernel
        operands = hf.consts                  # pass through SMEM/VMEM refs
        out = hf(args..., consts=decoded)     # inside the kernel
    """

    def __init__(self, fn, *example_args):
        closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example_args)
        self.jaxpr = closed.jaxpr
        self.consts = list(closed.consts)
        self.out_tree = jax.tree.structure(out_shape)
        self.eqns = _live_eqns(self.jaxpr)

    def __call__(self, *args, consts):
        flat, _ = jax.tree.flatten(args)
        outs = _eval_jaxpr_tpu_safe(self.jaxpr, list(consts), *flat, eqns=self.eqns)
        return jax.tree.unflatten(self.out_tree, outs)

    # -- loop-invariant code motion --------------------------------------
    def licm_split(self, varying_leaf_positions):
        """Partition the live eqns into a loop-INVARIANT prefix (depends
        only on the invars NOT listed in ``varying_leaf_positions``) and the
        varying rest. Returns the boundary vars — invariant outputs the
        varying eqns (or the jaxpr outputs) consume — whose values a caller
        computes once via :meth:`run_prefix` and feeds each loop iteration
        to :meth:`run_body`.

        Motivation: Mosaic does not reliably CSE identical coordinate-mask
        chains (iota + compare + and) across unrolled sub-steps; hoisting
        them out of the iteration loop removes them wholesale (convection:
        ~27 compares + 16 ands per iteration were re-emitted per sub-step).
        """
        from jax.extend.core import Literal

        invars = self.jaxpr.invars
        varying = {invars[i] for i in varying_leaf_positions}
        known = set(self.jaxpr.constvars) | (set(invars) - varying)
        inv_eqns, var_eqns = [], []
        for eqn in self.eqns:
            if not eqn.effects and all(
                isinstance(v, Literal) or v in known for v in eqn.invars
            ):
                inv_eqns.append(eqn)
                known.update(eqn.outvars)
            else:
                var_eqns.append(eqn)
        needed = set()
        for eqn in var_eqns:
            needed.update(v for v in eqn.invars if not isinstance(v, Literal))
        needed.update(
            v for v in self.jaxpr.outvars if not isinstance(v, Literal)
        )
        boundary = [
            v for eqn in inv_eqns for v in eqn.outvars if v in needed
        ]
        self._licm = (inv_eqns, var_eqns, boundary)
        return boundary

    def run_prefix(self, *args, consts):
        """Evaluate the invariant prefix once; returns boundary values (in
        ``licm_split`` order). Varying args may be placeholders — they are
        never read."""
        flat, _ = jax.tree.flatten(args)
        inv_eqns, _, boundary = self._licm
        return _eval_jaxpr_tpu_safe(
            self.jaxpr, list(consts), *flat, eqns=inv_eqns, outvars=boundary
        )

    def run_body(self, *args, consts, boundary_vals):
        """Evaluate the varying eqns with the invariant boundary seeded."""
        flat, _ = jax.tree.flatten(args)
        _, var_eqns, boundary = self._licm
        outs = _eval_jaxpr_tpu_safe(
            self.jaxpr,
            list(consts),
            *flat,
            eqns=var_eqns,
            env0=dict(zip(boundary, boundary_vals)),
        )
        return jax.tree.unflatten(self.out_tree, outs)


class KernelTDV:
    """Per-step TDV access inside a Pallas kernel.

    Mosaic has no dynamic slicing of *values*, so the per-iteration TDV
    stream cannot be indexed as an array inside the kernel. This helper
    splits the strategies into kernel-compatible pieces:

    * inline — ``tf.get_time_dependent_value(i_abs)`` hoisted (its closure
      constants become operands),
    * precomputed (host/device) — the stacked aux rides in SMEM/VMEM refs
      and is indexed per step with supported ref reads,
    * no TDV — ``None``.

    Usage: construct outside the kernel (inside jit); pass ``operands`` /
    ``specs`` through the pallas call; inside the kernel, ``decode`` the ref
    group then call ``lookup`` per step.
    """

    def __init__(self, strategy, tf, tdv_aux, n_iterations: int):
        from ..tdv import InlineTDV

        self.example = jax.eval_shape(
            lambda: strategy.lookup(tf, tdv_aux, 0, jnp.asarray(0, jnp.int32))
        )
        self.inline = isinstance(strategy, InlineTDV)
        if self.inline:
            self.hoisted = HoistedFn(
                lambda tf, i: tf.get_time_dependent_value(i),
                tf,
                jnp.asarray(0, jnp.int32),
            )
            self.aux_ops = Operands(None)
            self.const_ops = Operands(self.hoisted.consts, vectors_as_refs=False)
        else:
            self.hoisted = None
            self.aux_ops = Operands(tdv_aux)
            self.const_ops = Operands([], vectors_as_refs=False)
        self.operands = list(self.aux_ops.values) + list(self.const_ops.values)
        self.specs = list(self.aux_ops.specs) + list(self.const_ops.specs)

    def decode(self, refs):
        n_aux = len(self.aux_ops.values)
        return (
            self.aux_ops.decode(refs[:n_aux], as_refs=True),
            self.const_ops.decode(refs[n_aux:]),
        )

    def lookup(self, decoded, tf_v, i_rel, i_abs):
        """Per-step TDV, shaped like ``self.example``."""
        aux_v, consts_v = decoded
        if self.inline:
            return self.hoisted(tf_v, jnp.asarray(i_abs, jnp.int32), consts=consts_v)
        if not len(self.aux_ops.values):
            return None
        vals = jax.tree.map(lambda ref: ref[i_rel], aux_v)
        # Conform to the strategy's value shapes (VMEM-encoded 1-D streams
        # index to (1,) instead of scalars).
        return jax.tree.map(
            lambda v, ex: v if v.shape == ex.shape else v.reshape(ex.shape),
            vals,
            self.example,
        )


def should_interpret() -> bool:
    """Pallas interpreter mode off-TPU, so backends are testable on the
    virtual CPU mesh (the analog of the reference testing FPGA kernels on
    the emulator, SURVEY.md §4)."""
    return jax.default_backend() not in ("tpu",)
