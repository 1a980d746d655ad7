"""Bisect step 3: is the production gap HoistedFn's jaxpr re-emission?

Monkeypatches StripPass's HoistedFn with a subclass whose __call__ invokes
the traced function DIRECTLY (no eqn-by-eqn re-emission) — valid here
because the jacobi kernel's constants are concrete inside the jit trace.
Compare with experiments/micro_strippass.py (re-emission, ~143 GCell/s) and
experiments/micro_operands.py 'all' (hand-written kernel, ~164 GCell/s).
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

import stencilstream_tpu.backends.strip_pass as spmod
from stencilstream_tpu.backends.pallas_util import HoistedFn
from stencilstream_tpu.models import jacobi
from stencilstream_tpu.tdv import InlineTDV

SIZE = 8192
P = 8


class DirectHoisted(HoistedFn):
    def __init__(self, fn, *example_args):
        super().__init__(fn, *example_args)
        self._fn = fn

    def __call__(self, *args, consts):
        return self._fn(*args)


@functools.partial(jax.jit, static_argnames=("T", "n_passes", "direct"))
def run(x, *, T, n_passes, direct):
    kernel = jacobi.make_kernel("jacobi5_general", [0.15, 0.2, 0.25, 0.1, 0.3])
    prev = spmod.HoistedFn
    spmod.HoistedFn = DirectHoisted if direct else HoistedFn
    try:
        sp = spmod.StripPass(
            x,
            kernel,
            jnp.float32(0.0),
            InlineTDV(),
            None,
            radius=1,
            n_subiterations=1,
            n_iterations=n_passes * P,
            iters_per_pass=P,
            strip_rows=T,
            grid_range=x.shape,
            mode="clamped",
            unroll=8,
            shift_impl="roll",
        )
    finally:
        spmod.HoistedFn = prev

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
    for direct in (True, False):
        try:
            t0 = time.perf_counter()
            sync(run(x, T=128, n_passes=n1, direct=direct))
            compile_s = time.perf_counter() - t0
            w1 = timed(n1, T=128, direct=direct)
            w2 = timed(n2, T=128, direct=direct)
            gc = SIZE * SIZE * (n2 - n1) * P / (w2 - w1) / 1e9
            print(f"direct={direct}: {gc:7.2f} GCell/s marginal (compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"direct={direct}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
