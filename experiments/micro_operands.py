"""Isolate the production-vs-micro gap: operand plumbing cost.

The leanest jacobi5 micro kernel (micro_shifts.py, variant "inline") measures
~170 GCell/s marginal; the production StripPass measures ~143 with the same
shifts, windows, and output discipline. This experiment adds production
plumbing features to the micro kernel ONE AT A TIME:

* smemN    — N extra (1,1) SMEM scalar operands (production carries ~10:
             pass scalars, tf coefficients, halo value, hoisted consts)
* coef     — coefficients read from SMEM refs instead of literals
* hv       — halo value read from an SMEM ref instead of literal 0.0
* elemout  — element-indexed output BlockSpec instead of blocked
* outwhere — pick_core select chain (2 jnp.where) vs none

Usage: python experiments/micro_operands.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SIZE = 8192
T = 128
HP = 8
WIN = T + 2 * HP
P = 8


def make_kernel(n_strips, n_smem, use_coef_refs, use_hv_ref, use_outwhere):
    def kernel(*refs):
        smem_refs = refs[: n_smem + 5 * use_coef_refs + use_hv_ref]
        x_ref = refs[-2]
        o_ref = refs[-1]
        it = iter(smem_refs)
        extras = [next(it)[0, 0] for _ in range(n_smem)]
        if use_coef_refs:
            c = [next(it)[0, 0] for _ in range(5)]
        else:
            c = [jnp.float32(v) for v in (0.15, 0.2, 0.25, 0.1, 0.3)]
        hv = next(it)[0, 0] if use_hv_ref else jnp.float32(0.0)

        def substep(_, x):
            n0, n1 = x.shape
            idx = lax.broadcasted_iota(jnp.int32, x.shape, 1)
            north = jnp.where(
                lax.broadcasted_iota(jnp.int32, x.shape, 0) < 1,
                hv,
                pltpu.roll(x, 1, 0),
            )
            south = jnp.where(
                lax.broadcasted_iota(jnp.int32, x.shape, 0) >= n0 - 1,
                hv,
                pltpu.roll(x, n0 - 1, 0),
            )
            west = jnp.where(idx < 1, hv, pltpu.roll(x, 1, 1))
            east = jnp.where(idx >= n1 - 1, hv, pltpu.roll(x, n1 - 1, 1))
            out = c[4] * x + c[0] * north + c[1] * west + c[2] * south + c[3] * east
            if extras:
                # fold the extras in cheaply so they are not DCE'd
                out = out + jnp.float32(0.0) * sum(extras)
            return out

        x = lax.fori_loop(0, P, substep, x_ref[:], unroll=True)
        i = pl.program_id(0)
        if use_outwhere:
            s_first = lax.slice(x, (0, 0), (T, x.shape[1]))
            s_mid = lax.slice(x, (HP, 0), (HP + T, x.shape[1]))
            s_last = lax.slice(x, (2 * HP, 0), (2 * HP + T, x.shape[1]))
            o_ref[:] = jnp.where(
                i == 0, s_first, jnp.where(i == n_strips - 1, s_last, s_mid)
            )
        else:
            o_ref[:] = lax.slice(x, (HP, 0), (HP + T, x.shape[1]))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_smem", "use_coef_refs", "use_hv_ref", "use_elem_out", "use_outwhere", "n_passes"),
)
def run(x, scalars, *, n_smem, use_coef_refs, use_hv_ref, use_elem_out, use_outwhere, n_passes):
    H, Ws = x.shape
    n_strips = H // T
    kernel = make_kernel(n_strips, n_smem, use_coef_refs, use_hv_ref, use_outwhere)
    smem_vals = [scalars[i].reshape(1, 1) for i in range(n_smem)]
    if use_coef_refs:
        smem_vals += [jnp.asarray(v, jnp.float32).reshape(1, 1) for v in (0.15, 0.2, 0.25, 0.1, 0.3)]
    if use_hv_ref:
        smem_vals += [jnp.zeros((1, 1), jnp.float32)]
    smem_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * len(smem_vals)

    def origin(i):
        return jnp.clip(i * T - HP, 0, H - WIN)

    if use_elem_out:
        out_spec = pl.BlockSpec(
            (pl.Element(T), pl.Element(Ws)),
            lambda i: (pl.multiple_of(jnp.minimum(i * T, H - T), 8), 0),
            memory_space=pltpu.VMEM,
        )
    else:
        out_spec = pl.BlockSpec((T, Ws), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def one_pass(_, x):
        return pl.pallas_call(
            kernel,
            grid=(n_strips,),
            in_specs=smem_specs
            + [
                pl.BlockSpec(
                    (pl.Element(WIN), pl.Element(Ws)),
                    lambda i: (pl.multiple_of(origin(i), 8), 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((H, Ws), x.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(*smem_vals, x)

    return lax.fori_loop(0, n_passes, one_pass, x)


def main():
    x = jnp.asarray(np.random.default_rng(0).random((SIZE, SIZE), np.float32))
    scalars = jnp.arange(16, dtype=jnp.float32)

    def sync(out):
        np.asarray(out[0, 0])

    def timed(n_passes, **kw):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(x, scalars, n_passes=n_passes, **kw))
            best = min(best, time.perf_counter() - t0)
        return best

    cases = [
        ("baseline", dict(n_smem=0, use_coef_refs=False, use_hv_ref=False, use_elem_out=False, use_outwhere=True)),
        ("smem10", dict(n_smem=10, use_coef_refs=False, use_hv_ref=False, use_elem_out=False, use_outwhere=True)),
        ("coef", dict(n_smem=0, use_coef_refs=True, use_hv_ref=False, use_elem_out=False, use_outwhere=True)),
        ("hv", dict(n_smem=0, use_coef_refs=False, use_hv_ref=True, use_elem_out=False, use_outwhere=True)),
        ("elemout", dict(n_smem=0, use_coef_refs=False, use_hv_ref=False, use_elem_out=True, use_outwhere=True)),
        ("nowhere", dict(n_smem=0, use_coef_refs=False, use_hv_ref=False, use_elem_out=False, use_outwhere=False)),
        ("all", dict(n_smem=10, use_coef_refs=True, use_hv_ref=True, use_elem_out=True, use_outwhere=True)),
    ]
    n1, n2 = 64, 256
    for name, kw in cases:
        try:
            t0 = time.perf_counter()
            sync(run(x, scalars, n_passes=n1, **kw))
            compile_s = time.perf_counter() - t0
            w1 = timed(n1, **kw)
            w2 = timed(n2, **kw)
            gc = SIZE * SIZE * (n2 - n1) * P / (w2 - w1) / 1e9
            print(f"{name:10s}: {gc:7.2f} GCell/s marginal (compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:10s}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
