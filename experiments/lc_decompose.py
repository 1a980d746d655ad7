"""Decompose the product linecache pass cost on chip: LC kernel alone vs
+bands vs +dus patches (perf-only; numerics of partial variants are wrong by
construction — the full variant is the product path)."""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stencilstream_tpu.backends.fused import halo_width
from stencilstream_tpu.backends.line_cache import LineCachePass
from stencilstream_tpu.backends.strip_pass import StripPass
from stencilstream_tpu.backends.pallas_util import round_up
from stencilstream_tpu.models import jacobi
from stencilstream_tpu.tdv import InlineTDV


def build(H, W, T, p, variant, shift_impl="roll"):
    tf = jacobi.make_kernel("jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3])
    halo = jnp.float32(0.0)
    m = 8
    hp = halo_width(1, p, 1)
    hpm = round_up(hp, m)
    B = round_up(2 * hp, m)
    n_strips = -(-H // T)
    Hs = round_up(n_strips * T + hpm, m)

    @functools.partial(jax.jit, static_argnames=())
    def go(x, n_passes):
        lcp = LineCachePass(
            jax.tree.map(lambda a: jax.ShapeDtypeStruct((Hs, W), a.dtype), x),
            tf, halo, InlineTDV(), None,
            radius=1, n_subiterations=1, n_iterations=1 << 20,
            iters_per_pass=p, strip_rows=T, grid_range=(H, W),
            shift_impl=shift_impl,
        )
        band = StripPass(
            jax.tree.map(
                lambda a: jax.ShapeDtypeStruct((B + 2 * hpm, W), a.dtype), x
            ),
            tf, halo, InlineTDV(), None,
            radius=1, n_subiterations=1, n_iterations=1 << 20,
            iters_per_pass=p, strip_rows=B, grid_range=(H, W),
            mode="extended", base_origin=jnp.asarray(-hpm, jnp.int32),
            unroll=min(16, p), shift_impl=shift_impl,
        )
        top_frame = jnp.zeros((hpm, W), jnp.float32)

        def pass_body(i_pass, padded):
            i_start = i_pass * p
            out = lcp.run(padded, i_start, 0)
            if variant in ("full", "bands"):
                top_in = jnp.concatenate(
                    [top_frame, lax.slice(padded, (0, 0), (B + hpm, W))], axis=0
                )
                top = band.run(top_in, i_start, 0, jnp.asarray(-hpm, jnp.int32))
                bot_in = lax.slice(padded, (H - B - hpm, 0), (H + hpm, W))
                bot = band.run(
                    bot_in, i_start, 0, jnp.asarray(H - B - hpm, jnp.int32)
                )
                if variant == "full":
                    out = lax.dynamic_update_slice(out, top, (0, 0))
                    out = lax.dynamic_update_slice(out, bot, (H - B, 0))
                else:
                    # fold band results in without a full-array dus (adds a
                    # trivially cheap elementwise op on 2B rows instead)
                    out = out.at[0, 0].add(top[0, 0] * 0 + bot[0, 0] * 0)
            if variant == "dus":
                z = jnp.zeros((B, W), jnp.float32)
                out = lax.dynamic_update_slice(out, z, (0, 0))
                out = lax.dynamic_update_slice(out, z, (H - B, 0))
            return out

        return lax.fori_loop(0, n_passes, pass_body, x)

    return go


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument("--T", type=int, default=128)
    ap.add_argument("--p", type=int, default=16)
    ap.add_argument("--variants", default="kernel,bands,dus,full")
    args = ap.parse_args()
    H = W = args.size
    T, p = args.T, args.p
    m = 8
    hp = p
    hpm = round_up(hp, m)
    n_strips = -(-H // T)
    Hs = round_up(n_strips * T + hpm, m)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.pad(rng.random((H, W), np.float32), ((0, Hs - H), (0, 0)))
    )

    iters = 2048
    n1, n2 = max(iters // p // 4, 1), max(iters // p, 2)

    for variant in args.variants.split(","):
        label = f"{variant:7s} T={T} p={p}"
        try:
            go = build(H, W, T, p, variant)
            f = lambda n: go(x, jnp.asarray(n, jnp.int32))
            t0 = time.perf_counter()
            np.asarray(f(n1)[0, 0])
            compile_s = time.perf_counter() - t0

            def timed(n):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(f(n)[0, 0])
                    best = min(best, time.perf_counter() - t0)
                return best

            w1, w2 = timed(n1), timed(n2)
            gc = H * W * (n2 - n1) * p / (w2 - w1) / 1e9
            print(
                f"{label}: {gc:7.2f} GCell/s marginal "
                f"(w1 {w1:.3f}s/{n1}, w2 {w2:.3f}s/{n2}, compile {compile_s:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(
                f"{label}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:160]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
