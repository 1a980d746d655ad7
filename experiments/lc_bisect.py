"""Bisect which structure element hangs the Mosaic compile in the linecache
kernel: 3D scratch, pl.when init, scratch at all, element specs."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W0, WN, WS, WW, WE = 0.15, 0.2, 0.25, 0.1, 0.3
H, Wd, p, T = 1024, 1024, 8, 128
hp = p


def build(variant):
    def substeps(own, read_c, write_c):
        lane = lax.broadcasted_iota(jnp.int32, (T, Wd), 1)
        wmask = lane < 1
        emask = lane >= Wd - 1
        for s in range(p):
            c = read_c(s)
            write_c(s, own[T - 2 : T, :])
            center = jnp.concatenate([c[1:2, :], own[: T - 1, :]], axis=0)
            north = jnp.concatenate([c, own[: T - 2, :]], axis=0)
            west = jnp.where(wmask, 0.0, pltpu.roll(center, 1, 1))
            east = jnp.where(emask, 0.0, pltpu.roll(center, Wd - 1, 1))
            own = W0 * center + WN * north + WS * own + WW * west + WE * east
        return own

    if variant == "noscratch":
        def kernel(x_ref, o_ref):
            z = jnp.zeros((2, Wd), jnp.float32)
            o_ref[:] = substeps(x_ref[:], lambda s: z, lambda s, v: None)
        scratch = []
    elif variant == "scratch3d":
        def kernel(x_ref, o_ref, carry):
            @pl.when(pl.program_id(0) == 0)
            def _():
                carry[:] = jnp.zeros_like(carry)
            o_ref[:] = substeps(
                x_ref[:], lambda s: carry[s], lambda s, v: carry.__setitem__(s, v)
            )
        scratch = [pltpu.VMEM((p, 2, Wd), jnp.float32)]
    elif variant == "scratch3d_noinit":
        def kernel(x_ref, o_ref, carry):
            o_ref[:] = substeps(
                x_ref[:], lambda s: carry[s], lambda s, v: carry.__setitem__(s, v)
            )
        scratch = [pltpu.VMEM((p, 2, Wd), jnp.float32)]
    elif variant == "scratch2d":
        def kernel(x_ref, o_ref, carry):
            @pl.when(pl.program_id(0) == 0)
            def _():
                carry[:] = jnp.zeros_like(carry)
            o_ref[:] = substeps(
                x_ref[:],
                lambda s: carry[8 * s : 8 * s + 2, :],
                lambda s, v: carry.__setitem__(
                    (slice(8 * s, 8 * s + 2), slice(None)), v
                ),
            )
        scratch = [pltpu.VMEM((8 * p, Wd), jnp.float32)]
    elif variant == "scratch2d_noinit":
        def kernel(x_ref, o_ref, carry):
            o_ref[:] = substeps(
                x_ref[:],
                lambda s: carry[8 * s : 8 * s + 2, :],
                lambda s, v: carry.__setitem__(
                    (slice(8 * s, 8 * s + 2), slice(None)), v
                ),
            )
        scratch = [pltpu.VMEM((8 * p, Wd), jnp.float32)]
    else:
        raise ValueError(variant)

    n_strips = H // T

    @jax.jit
    def go(x):
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
            out_specs=pl.BlockSpec(
                (pl.Element(T), pl.Element(Wd)),
                lambda i: (pl.multiple_of(i * T, 8), 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(x)

    return go


def main():
    variant = sys.argv[1]
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.pad(rng.random((H, Wd), np.float32), ((0, 8), (0, 0))))
    t0 = time.time()
    out = build(variant)(x)
    np.asarray(out[0, 0])
    print(f"{variant}: OK in {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
