"""Bisect the production-vs-micro jacobi gap: drive the REAL StripPass in a
micro-style harness (fori over passes, one jit, no Grid/update machinery).

If this measures like micro_operands.py 'all' (~164), the gap is in the
backend machinery around StripPass; if it measures like production (~143),
the gap is inside the kernel StripPass builds (HoistedFn emission order,
step composition, ...).
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stencilstream_tpu.backends.strip_pass import StripPass
from stencilstream_tpu.models import jacobi
from stencilstream_tpu.tdv import InlineTDV

SIZE = 8192
P = 8


@functools.partial(jax.jit, static_argnames=("T", "n_passes", "shift_impl"))
def run(x, *, T, n_passes, shift_impl):
    kernel = jacobi.make_kernel("jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3])
    n_iterations = n_passes * P
    sp = StripPass(
        x,
        kernel,
        jnp.float32(0.0),
        InlineTDV(),
        None,
        radius=1,
        n_subiterations=1,
        n_iterations=n_iterations,
        iters_per_pass=P,
        strip_rows=T,
        grid_range=x.shape,
        mode="clamped",
        unroll=8,
        shift_impl=shift_impl,
    )

    def one_pass(i, x):
        return sp.run(x, i * P, 0)

    return lax.fori_loop(0, n_passes, one_pass, x)


def main():
    x = jnp.asarray(np.random.default_rng(0).random((SIZE, SIZE), np.float32))

    def sync(out):
        np.asarray(out[0, 0])

    def timed(n_passes, **kw):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(x, n_passes=n_passes, **kw))
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = 64, 256
    for shift in ("roll", "concat"):
        for T in (128, 112):
            try:
                t0 = time.perf_counter()
                sync(run(x, T=T, n_passes=n1, shift_impl=shift))
                compile_s = time.perf_counter() - t0
                w1 = timed(n1, T=T, shift_impl=shift)
                w2 = timed(n2, T=T, shift_impl=shift)
                gc = SIZE * SIZE * (n2 - n1) * P / (w2 - w1) / 1e9
                print(f"T={T} {shift:6s}: {gc:7.2f} GCell/s marginal (compile {compile_s:.0f}s)", flush=True)
            except Exception as e:
                print(f"T={T} {shift:6s}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
