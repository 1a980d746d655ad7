import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SIZE, T, HP, P = 8192, 128, 8, 8
WIN = T + 2 * HP

def make_kernel(n_strips, variant):
    def kernel(x_ref, o_ref):
        C = [jnp.float32(v) for v in (0.15, 0.2, 0.25, 0.1, 0.3)]
        hv = jnp.float32(0.0)

        def taps(x):
            n0, n1 = x.shape
            i0 = lax.broadcasted_iota(jnp.int32, x.shape, 0)
            i1 = lax.broadcasted_iota(jnp.int32, x.shape, 1)
            north = jnp.where(i0 < 1, hv, pltpu.roll(x, 1, 0))
            south = jnp.where(i0 >= n0 - 1, hv, pltpu.roll(x, n0 - 1, 0))
            west = jnp.where(i1 < 1, hv, pltpu.roll(x, 1, 1))
            east = jnp.where(i1 >= n1 - 1, hv, pltpu.roll(x, n1 - 1, 1))
            return north, south, west, east

        def sub_centerfirst(_, x):
            n_, s_, w_, e_ = taps(x)
            return C[4] * x + C[0] * n_ + C[1] * w_ + C[2] * s_ + C[3] * e_

        def sub_centerlast(_, x):
            n_, s_, w_, e_ = taps(x)
            return C[0] * n_ + C[1] * w_ + C[2] * s_ + C[3] * e_ + C[4] * x

        def sub_interleaved_cf(_, x):
            n0, n1 = x.shape
            i0 = lax.broadcasted_iota(jnp.int32, x.shape, 0)
            i1 = lax.broadcasted_iota(jnp.int32, x.shape, 1)
            acc = C[4] * x
            acc = acc + C[0] * jnp.where(i0 < 1, hv, pltpu.roll(x, 1, 0))
            acc = acc + C[1] * jnp.where(i1 < 1, hv, pltpu.roll(x, 1, 1))
            acc = acc + C[2] * jnp.where(i0 >= n0 - 1, hv, pltpu.roll(x, n0 - 1, 0))
            acc = acc + C[3] * jnp.where(i1 >= n1 - 1, hv, pltpu.roll(x, n1 - 1, 1))
            return acc

        def sub_grouped_nwse(_, x):
            n0, n1 = x.shape
            i0 = lax.broadcasted_iota(jnp.int32, x.shape, 0)
            i1 = lax.broadcasted_iota(jnp.int32, x.shape, 1)
            north = jnp.where(i0 < 1, hv, pltpu.roll(x, 1, 0))
            west = jnp.where(i1 < 1, hv, pltpu.roll(x, 1, 1))
            south = jnp.where(i0 >= n0 - 1, hv, pltpu.roll(x, n0 - 1, 0))
            east = jnp.where(i1 >= n1 - 1, hv, pltpu.roll(x, n1 - 1, 1))
            return C[0] * north + C[1] * west + C[2] * south + C[3] * east + C[4] * x

        body = {"centerfirst": sub_centerfirst,
                "centerlast": sub_centerlast,
                "inter_cf": sub_interleaved_cf,
                "grouped_nwse": sub_grouped_nwse}[variant]
        x = lax.fori_loop(0, P, body, x_ref[:], unroll=True)
        i = pl.program_id(0)
        s_first = lax.slice(x, (0, 0), (T, x.shape[1]))
        s_mid = lax.slice(x, (HP, 0), (HP + T, x.shape[1]))
        s_last = lax.slice(x, (2 * HP, 0), (2 * HP + T, x.shape[1]))
        o_ref[:] = jnp.where(i == 0, s_first, jnp.where(i == n_strips - 1, s_last, s_mid))
    return kernel

@functools.partial(jax.jit, static_argnames=("variant", "n_passes"))
def run(x, *, variant, n_passes):
    H, Ws = x.shape
    n_strips = H // T
    kernel = make_kernel(n_strips, variant)
    def origin(i):
        return jnp.clip(i * T - HP, 0, H - WIN)
    def one_pass(_, x):
        return pl.pallas_call(
            kernel, grid=(n_strips,),
            in_specs=[pl.BlockSpec((pl.Element(WIN), pl.Element(Ws)),
                                   lambda i: (pl.multiple_of(origin(i), 8), 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, Ws), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, Ws), x.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(x)
    return lax.fori_loop(0, n_passes, one_pass, x)

x = jnp.asarray(np.random.default_rng(0).random((SIZE, SIZE), np.float32))
def sync(o): np.asarray(o[0, 0])
def timed(n, **kw):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); sync(run(x, n_passes=n, **kw)); best = min(best, time.perf_counter() - t0)
    return best
n1, n2 = 64, 256
for variant in ("centerfirst", "centerlast", "inter_cf", "grouped_nwse"):
    sync(run(x, variant=variant, n_passes=n1))
    w1, w2 = timed(n1, variant=variant), timed(n2, variant=variant)
    gc = SIZE * SIZE * (n2 - n1) * P / (w2 - w1) / 1e9
    print(f"{variant:12s}: {gc:7.2f} GCell/s marginal", flush=True)

# Measured on TPU v5e (2026-08, this file at 8192^2, strip 128, p=8, unroll
# full; marginal = fixed dispatch cost cancelled):
#
#   centerfirst :  163.09 GCell/s   (taps grouped, chain starts C4*x)
#   inter_cf    :  161.81 GCell/s   (interleaved arith, chain starts C4*x)
#   centerlast  :  143.56 GCell/s   (taps grouped, chain ENDS with +C4*x)
#   grouped_nwse:  143.07 GCell/s   (taps grouped, center last, NWSE order)
#
# Conclusion: the ~14% production-vs-micro gap of round 2 was the ACCUMULATION
# CHAIN ORDER inside the transition function, not framework plumbing (SMEM
# operand count, coefficient/halo refs, element-indexed outputs, the 3-way
# core select, HoistedFn re-emission, and per-pass-varying scalars all
# measured within noise — see micro_operands.py / micro_strippass.py /
# micro_hoisted.py). When the chain STARTS with the center term, its operand
# is available immediately and Mosaic issues the FMA chain behind the
# in-flight neighbor rotates; when the center comes last, every FMA waits on
# its rotate. App kernels should start accumulations with the center tap
# (models/jacobi.py does; FDTD/HotSpot already had this shape).
