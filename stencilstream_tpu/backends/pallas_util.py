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

    def decode(self, refs) -> Any:
        leaves = []
        for ref, m, dt, nd in zip(refs, self.modes, self.dtypes, self.ndims):
            if m == "smem_scalar":
                v = ref[0, 0]
                if dt == jnp.bool_:
                    v = v.astype(jnp.bool_)
            elif m == "smem_vector":
                v = ref  # indexed per step by consumers
            else:
                v = ref[:]
                if nd == 1:
                    v = v.reshape(v.shape[0])
                if dt == jnp.bool_:
                    v = v.astype(jnp.bool_)
            leaves.append(v)
        return jax.tree.unflatten(self.treedef, leaves)


class HoistedFn:
    """A function traced to a jaxpr with ALL closure constants hoisted.

    Pallas kernels may not capture array constants, but user transition
    functions are full of them (coefficient scalars, LUT tables, module-level
    ``jnp`` constants). ``jax.closure_convert`` hoists only *traced* captures;
    this hoists every jaxpr const — concrete or traced — so the function can
    be re-emitted inside a kernel with the consts fed through operands.

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

    def __call__(self, *args, consts):
        flat, _ = jax.tree.flatten(args)
        from jax import core

        outs = core.eval_jaxpr(self.jaxpr, list(consts), *flat)
        return jax.tree.unflatten(self.out_tree, outs)


def should_interpret() -> bool:
    """Pallas interpreter mode off-TPU, so backends are testable on the
    virtual CPU mesh (the analog of the reference testing FPGA kernels on
    the emulator, SURVEY.md §4)."""
    return jax.default_backend() not in ("tpu",)
