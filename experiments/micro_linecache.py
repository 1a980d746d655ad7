"""Line-cache (skewed) strip kernel vs the production pad-mode StripPass.

The pad-mode strip kernel re-reads AND re-computes 2*hp halo rows per strip
(redundancy (T+2hp)/T, e.g. 1.14x at T=224/p=16). The FPGA reference never
does: its line cache carries boundary rows between pipeline stages
(monotile/internal/StencilUpdateKernel.hpp:180-186). The TPU analog measured
here: process strips SEQUENTIALLY (dimension_semantics=("arbitrary",)),
carrying, per fused level s, the bottom 2r rows of each strip in a VMEM
scratch (S, 2r, W). Strip j reads input rows [jT+hp, (j+1)T+hp) (plain
stride-T element window, no overlap), computes level s+1 rows
[jT+(S-s-1)r, ...+T) from its own level-s rows plus the 2r carried rows, and
writes output rows [jT, (j+1)T) (plain blocked). Taps are realized as
roll(own, r-dr) with the top r-dr rows patched from the carry at STATIC
offsets, so the per-substep op mix matches monotile's.

Perf harness only: carry starts zeroed (top ~hp output rows wrong) and the
bottom hp rows are not patched; the numerics check compares INTERIOR rows
against the exact pad-mode pass. Correct edges are an XLA-side
triangle/patch in the product integration (see strip_pass.py).
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

# Coefficients in the CLI order make_kernel receives them: (c0..c4) =
# (north, west, south, east, center) — Jacobi5General applies
# c4*center + c0*north + c1*west + c2*south + c3*east, center-first.
CN, WW_, WS, WE, W0 = 0.15, 0.2, 0.25, 0.1, 0.3
COEFS = [CN, WW_, WS, WE, W0]


def make_lc_kernel(T, Wd, p, n_strips, io_alias, stitch=False):
    """Line-cache jacobi5: r=1, k=1, S=p levels, full unroll.

    ``stitch=True``: FPGA-style ref stitching — the window lives in a
    persistent (T+2r, Wd) VMEM scratch; vertical taps are plain
    static-offset loads instead of concat materializations."""

    def kernel(x_ref, o_ref, carry, *maybe_ext):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)

        own = x_ref[:]  # (T, Wd), level 0 = input rows [jT+hp, (j+1)T+hp)
        lane = lax.broadcasted_iota(jnp.int32, (T, Wd), 1)
        wmask = lane < 1
        emask = lane >= Wd - 1

        for s in range(p):
            if stitch:
                ext = maybe_ext[0]
                ext[0:2] = carry[s]
                ext[2:] = own
                carry[s] = own[T - 2 : T, :]
                center = ext[1 : 1 + T]
                north = ext[0:T]
            else:
                c = carry[s]  # (2, Wd): rows just above own at level s
                carry[s] = own[T - 2 : T, :]  # next strip's slot s
                # Taps (r=1): south = win[i+2] = own[i]; center = win[i+1]
                # = shift-down-1 with row0 from the carry; north =
                # shift-down-2 with rows 0:2 from the carry (concat = the
                # production concat-shift with the halo frame replaced by
                # carried rows).
                center = jnp.concatenate([c[1:2, :], own[: T - 1, :]], axis=0)
                north = jnp.concatenate([c, own[: T - 2, :]], axis=0)
            south = own
            west = jnp.where(wmask, 0.0, pltpu.roll(center, 1, 1))
            east = jnp.where(emask, 0.0, pltpu.roll(center, Wd - 1, 1))
            # EXACT production chain (Jacobi5General.__call__): center-first,
            # then north, west, south, east — bit-identical f32 order.
            own = W0 * center + CN * north + WW_ * west + WS * south + WE * east
        o_ref[:] = own

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("T", "p", "io_alias", "H", "interpret", "stitch", "blocked"),
)
def run_lc(x, *, T, p, n_passes, io_alias, H, interpret=False, stitch=False,
           blocked=False):
    # n_passes is TRACED (fori with dynamic trip count): one Mosaic compile
    # serves every pass count — compiles cost minutes on the shared service.
    Ha, Wd = x.shape  # Ha = H + pad (pad >= hp; blocked: Ha multiple of T)
    hp = p  # r=1, k=1
    n_strips = H // T
    kernel = make_lc_kernel(T, Wd, p, n_strips, io_alias, stitch=stitch)

    if blocked:
        # Plain blocked output spec (element-indexed output blocks disable
        # Mosaic's write pipelining); requires T | Ha.
        assert Ha % T == 0, (Ha, T)
        out_spec = pl.BlockSpec((T, Wd), lambda i: (i, 0), memory_space=pltpu.VMEM)
    else:
        out_spec = pl.BlockSpec(
            (pl.Element(T), pl.Element(Wd)),
            lambda i: (pl.multiple_of(i * T, 8), 0),
            memory_space=pltpu.VMEM,
        )
    scratch = [pltpu.VMEM((p, 2, Wd), jnp.float32)]
    if stitch:
        scratch.append(pltpu.VMEM((T + 2, Wd), jnp.float32))

    def one_pass(_, x):
        return pl.pallas_call(
            kernel,
            grid=(n_strips,),
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(T), pl.Element(Wd)),
                    lambda i: (pl.multiple_of(i * T + hp, 8), 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Ha, Wd), x.dtype),
            scratch_shapes=scratch,
            input_output_aliases={0: 0} if io_alias else {},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(x)

    return lax.fori_loop(0, n_passes, one_pass, x)


# ---- pad-mode baseline (production path) --------------------------------


def run_pad(x, *, T, p, n_passes, shift_impl="roll", unroll=16):
    sys.path.insert(0, "/root/repo")
    from stencilstream_tpu.backends.strip_pass import StripPass
    from stencilstream_tpu.models import jacobi
    from stencilstream_tpu.tdv import InlineTDV

    @functools.partial(jax.jit, static_argnames=("T", "p"))
    def go(x, n_passes, *, T, p):
        kernel = jacobi.make_kernel(
            "jacobi5_general", COEFS
        )
        sp = StripPass(
            x,
            kernel,
            jnp.float32(0.0),
            InlineTDV(),
            None,
            radius=1,
            n_subiterations=1,
            n_iterations=1 << 20,  # static; only has_partial/TDV derive from it
            iters_per_pass=p,
            strip_rows=T,
            grid_range=x.shape,
            mode="clamped",
            unroll=min(unroll, p),
            shift_impl=shift_impl,
        )
        return lax.fori_loop(0, n_passes, lambda i, x: sp.run(x, i * p, 0), x)

    return go(x, jnp.asarray(n_passes, jnp.int32), T=T, p=p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--variants", type=str, default="pad224x16,lc256x16,lc128x16,lc256x32,lc256x16a")
    args = ap.parse_args()
    H = args.size
    rng = np.random.default_rng(0)
    x0 = np.asarray(rng.random((H, H), np.float32))

    def sync(out):
        np.asarray(out[0, 0])

    if args.check:
        p = 8
        xa = jnp.asarray(np.pad(x0, ((0, 16), (0, 0))))
        lc = np.asarray(run_lc(xa, T=256, p=p, n_passes=1, io_alias=False, H=H))
        ref = np.asarray(run_pad(jnp.asarray(x0), T=224, p=p, n_passes=1))
        hp = p
        inner = slice(2 * hp, H - 2 * hp)
        err = np.abs(lc[inner] - ref[inner]).max()
        print(f"interior max err (rows {2*hp}:{H-2*hp}): {err:.3e}", flush=True)
        assert err == 0.0, "linecache interior mismatch"
        return

    cases = []
    for v in args.variants.split(","):
        alias = v.endswith("a")
        core = v.rstrip("a")
        if core.startswith("pad"):
            T, p = core[3:].split("x")
            cases.append(("pad", int(T), int(p), False))
        else:
            head = core[2:]
            mods = ""
            while head and head[0] in "sb":
                mods += head[0]
                head = head[1:]
            T, p = head.split("x")
            cases.append((f"lc{mods}", int(T), int(p), alias))

    for kind, T, p, alias in cases:
        label = f"{kind} T={T} p={p}{' alias' if alias else ''}"
        try:
            iters = 2048
            n1, n2 = max(iters // p // 4, 1), max(iters // p, 2)

            if kind.startswith("lc"):
                stitch = "s" in kind
                blocked = "b" in kind
                pad = T if blocked else ((p + 7) // 8) * 8
                x = jnp.asarray(np.pad(x0, ((0, pad), (0, 0))))
                f = lambda n: run_lc(
                    x, T=T, p=p, n_passes=n, io_alias=alias, H=H,
                    stitch=stitch, blocked=blocked,
                )
            else:
                x = jnp.asarray(x0)
                f = lambda n: run_pad(x, T=T, p=p, n_passes=n)

            t0 = time.perf_counter()
            sync(f(n1))
            compile_s = time.perf_counter() - t0

            def timed(n):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    sync(f(n))
                    best = min(best, time.perf_counter() - t0)
                return best

            w1, w2 = timed(n1), timed(n2)
            gc = H * H * (n2 - n1) * p / (w2 - w1) / 1e9
            print(
                f"{label:24s}: {gc:7.2f} GCell/s marginal "
                f"(w1 {w1:.3f}s/{n1}, w2 {w2:.3f}s/{n2}, compile {compile_s:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(
                f"{label:24s}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:140]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
