"""Microbenchmark: per-substep op cost of neighbor shifts + halo masking.

Measures the achievable GCell/s of a p-fused jacobi5-style kernel over an
8192^2 grid in strips, for kernel variants that differ only in how neighbor
shifts and halo masks are lowered:

* wrap      — pltpu.roll only, no edge masking (WRONG at edges; upper bound)
* hoisted   — pltpu.roll + edge select against masks computed ONCE before the
              substep loop (loop-invariant hoisting)
* inline    — pltpu.roll + mask recomputed (iota+cmp) every substep (what
              fused.shifted does today)
* concat    — slice+concat shifts (the current default lowering)

This isolates the shift/mask cost from the full backend machinery.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W0, WN, WS, WW, WE = 0.15, 0.2, 0.25, 0.1, 0.3


def make_kernel(win_rows, Ws, T, hp, n_strips, p, variant):
    def shift(a, d, axis, masks):
        n = a.shape[axis]
        if variant == "concat":
            shape = list(a.shape)
            shape[axis] = abs(d)
            frame = jnp.zeros(shape, a.dtype)
            if d > 0:
                return jnp.concatenate([lax.slice_in_dim(a, d, n, axis=axis), frame], axis=axis)
            return jnp.concatenate([frame, lax.slice_in_dim(a, 0, n + d, axis=axis)], axis=axis)
        out = pltpu.roll(a, (-d) % n, axis)
        if variant == "wrap":
            return out
        if variant == "hoisted":
            return jnp.where(masks[(d, axis)], jnp.float32(0.0), out)
        idx = lax.broadcasted_iota(jnp.int32, a.shape, axis)
        oob = (idx >= n - d) if d > 0 else (idx < -d)
        return jnp.where(oob, jnp.float32(0.0), out)

    # Composite 2-step weights: the 13-point (radius-2) stencil equal to two
    # applications of the 5-point one (interior only; micro ignores edges).
    import numpy as _np

    W1 = _np.zeros((5, 5))
    W1[2, 2], W1[1, 2], W1[3, 2], W1[2, 1], W1[2, 3] = W0, WN, WS, WW, WE
    W2 = _np.zeros((5, 5))
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            if W1[2 + dy, 2 + dx]:
                for ey in range(-1, 2):
                    for ex in range(-1, 2):
                        if W1[2 + ey, 2 + ex]:
                            W2[2 + dy + ey, 2 + dx + ex] += (
                                W1[2 + dy, 2 + dx] * W1[2 + ey, 2 + ex]
                            )

    def kernel(x_ref, o_ref):
        masks = {}
        if variant == "hoisted":
            for d, axis in ((1, 0), (-1, 0), (1, 1), (-1, 1)):
                n = x_ref.shape[axis]
                idx = lax.broadcasted_iota(jnp.int32, x_ref.shape, axis)
                masks[(d, axis)] = (idx >= n - d) if d > 0 else (idx < -d)

        def substep(_, x):
            north = shift(x, -1, 0, masks)
            south = shift(x, 1, 0, masks)
            west = shift(x, -1, 1, masks)
            east = shift(x, 1, 1, masks)
            return (W0 * x + WN * north + WS * south + WW * west + WE * east)

        def substep_nomaskrow(_, x):
            # Sublane (row) shifts without edge masks: wrapped rows land in
            # the stale margin of interior strips. Lane shifts keep masks
            # (true grid boundary).
            n0, n1 = x.shape
            north = pltpu.roll(x, 1 % n0, 0)
            south = pltpu.roll(x, (-1) % n0, 0)
            idx = lax.broadcasted_iota(jnp.int32, x.shape, 1)
            west = jnp.where(idx < 1, 0.0, pltpu.roll(x, 1, 1))
            east = jnp.where(idx >= n1 - 1, 0.0, pltpu.roll(x, n1 - 1, 1))
            return (W0 * x + WN * north + WS * south + WW * west + WE * east)

        def substep2_composite(_, x):
            # One trip = TWO iterations via the 13-point composite. Row
            # shifts shared across each row's lane taps; lane edges masked.
            n0, n1 = x.shape
            idx = lax.broadcasted_iota(jnp.int32, x.shape, 1)
            acc = None
            for dy in range(-2, 3):
                row = x if dy == 0 else pltpu.roll(x, (-dy) % n0, 0)
                for dx in range(-2, 3):
                    wgt = W2[2 + dy, 2 + dx]
                    if not wgt:
                        continue
                    if dx == 0:
                        tap = row
                    else:
                        tap = pltpu.roll(row, (-dx) % n1, 1)
                        oob = (idx >= n1 - dx) if dx > 0 else (idx < -dx)
                        tap = jnp.where(oob, 0.0, tap)
                    term = jnp.float32(wgt) * tap
                    acc = term if acc is None else acc + term
            return acc

        def substep_fma(s, x):
            # 5 dependent FMAs, no shifts: measures raw VPU FMA throughput.
            for j in range(5):
                x = jnp.float32(0.9997 + 0.0001 * j) * x + jnp.float32(1e-7 * (j + 1))
            return x

        def substep_shiftonly(s, x):
            # 4 rolls + 3 adds, one mul: isolates shift cost.
            n0, n1 = x.shape
            a = pltpu.roll(x, 1, 0)
            b = pltpu.roll(x, n0 - 1, 0)
            c = pltpu.roll(x, 1, 1)
            d = pltpu.roll(x, n1 - 1, 1)
            return jnp.float32(0.249) * (a + b + c + d)

        def run_shrink(x0):
            # Rows SHRINK by r per side per substep (slices, no row masks);
            # lanes stay pad-mode (roll + edge mask). After p substeps the
            # surviving rows are exactly the strip core. Interior strips
            # only — edge strips need per-substep hv re-injection.
            x = x0
            for s in range(p):
                h = x.shape[0]
                n1 = x.shape[1]
                center = x[1 : h - 1, :]
                north = x[0 : h - 2, :]
                south = x[2:h, :]
                idx = lax.broadcasted_iota(jnp.int32, center.shape, 1)
                west = jnp.where(idx < 1, 0.0, pltpu.roll(center, 1, 1))
                east = jnp.where(idx >= n1 - 1, 0.0, pltpu.roll(center, n1 - 1, 1))
                x = (W0 * center + WN * north + WS * south + WW * west + WE * east)
            return x

        if variant == "shrink":
            o_ref[:] = run_shrink(x_ref[:])
            return

        if variant == "composite":
            x = lax.fori_loop(0, p // 2, substep2_composite, x_ref[:], unroll=True)
        elif variant == "nomaskrow":
            x = lax.fori_loop(0, p, substep_nomaskrow, x_ref[:], unroll=True)
        elif variant == "fma":
            x = lax.fori_loop(0, p, substep_fma, x_ref[:], unroll=True)
        elif variant == "shiftonly":
            x = lax.fori_loop(0, p, substep_shiftonly, x_ref[:], unroll=True)
        else:
            x = lax.fori_loop(0, p, substep, x_ref[:], unroll=True)
        i = pl.program_id(0)
        s_first = lax.slice(x, (0, 0), (T, Ws))
        s_mid = lax.slice(x, (hp, 0), (hp + T, Ws))
        s_last = lax.slice(x, (2 * hp, 0), (2 * hp + T, Ws))
        o_ref[:] = jnp.where(i == 0, s_first, jnp.where(i == n_strips - 1, s_last, s_mid))

    return kernel


@functools.partial(jax.jit, static_argnames=("T", "hp", "p", "variant"))
def run(x, n_passes, *, T, hp, p, variant):
    # n_passes TRACED: one Mosaic compile serves every pass count.
    H, Ws = x.shape
    win_rows = T + 2 * hp
    n_strips = H // T
    kernel = make_kernel(win_rows, Ws, T, hp, n_strips, p, variant)

    def origin(i):
        return jnp.clip(i * T - hp, 0, H - win_rows)

    def one_pass(_, x):
        return pl.pallas_call(
            kernel,
            grid=(n_strips,),
            in_specs=[pl.BlockSpec((pl.Element(win_rows), pl.Element(Ws)),
                                   lambda i: (pl.multiple_of(origin(i), 8), 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, Ws), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, Ws), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    return lax.fori_loop(0, n_passes, one_pass, x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=1024)
    ap.add_argument("--strips", type=str, default="128,256")
    ap.add_argument("--ps", type=str, default="8,16")
    ap.add_argument("--variants", type=str, default="wrap,hoisted,inline,concat")
    args = ap.parse_args()

    size = args.size
    x = jnp.asarray(np.random.default_rng(0).random((size, size), np.float32))

    def sync(out):
        # block_until_ready is a no-op on tunneled PJRT platforms; a
        # one-element fetch cannot return early (see core.Grid).
        np.asarray(out[0, 0])

    def timed(T, hp, p, variant, n_passes):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(x, jnp.asarray(n_passes, jnp.int32), T=T, hp=hp, p=p, variant=variant))
            best = min(best, time.perf_counter() - t0)
        return best

    for T in [int(s) for s in args.strips.split(",")]:
        for p in [int(s) for s in args.ps.split(",")]:
            hp = ((p + 7) // 8) * 8  # halo aligned to sublanes (r=1, k=1)
            n1 = max(args.iters // p // 4, 1)
            n2 = max(args.iters // p, 2)
            for variant in args.variants.split(","):
                try:
                    t0 = time.perf_counter()
                    sync(run(x, jnp.asarray(n1, jnp.int32), T=T, hp=hp, p=p, variant=variant))
                    compile_s = time.perf_counter() - t0
                    w1 = timed(T, hp, p, variant, n1)
                    sync(run(x, jnp.asarray(n2, jnp.int32), T=T, hp=hp, p=p, variant=variant))
                    w2 = timed(T, hp, p, variant, n2)
                    # Marginal rate: extra passes / extra time — cancels the
                    # fixed per-call dispatch overhead of the tunneled runtime.
                    gc = size * size * (n2 - n1) * p / (w2 - w1) / 1e9
                    print(f"T={T:4d} p={p:3d} {variant:8s}: {gc:7.2f} GCell/s marginal "
                          f"(w1 {w1:.3f}s/{n1}, w2 {w2:.3f}s/{n2}, compile {compile_s:.0f}s)",
                          flush=True)
                except Exception as e:
                    print(f"T={T:4d} p={p:3d} {variant:8s}: FAILED "
                          f"{type(e).__name__}: {str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
