"""Convection op-diet ladder: how far can the select-heavy 11-field op mix
be reduced? (VERDICT r2 next-round #2.)

Variants, all run through the REAL StripPass at the production geometry
(cuda-benchmark scale 3071x1023, strip 160, p=16, u=16):

* prod    — the production PseudoTransientKernel (baseline ~16.4 GCell/s).
* folded  — coordinate masks precomputed into INVARIANT cell planes
            (int8 masks ride free through the invariant-field elision) and
            accumulate-style updates folded into coefficient-plane FMAs
            (Pt/dV*_tau/V* lose their selects entirely). Bit-exact vs prod.
* lean    — folded MINUS the ErrV/ErrP bookkeeping (the error fields are
            only read after each nerr-block, so all but the block's last
            iteration can skip them; the model runs lean passes + one full
            pass per block). Err fields become invariant -> elided.
* floor   — physics ops only (no masks, no selects, no BC substep): the
            irreducible arithmetic+shift mix. WRONG at edges; upper bound.

If floor lands < 30 GCell/s the op mix is genuinely irreducible at f32 and
the committed numbers are the ceiling; anything folded/lean deliver gets
productized in models/convection.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stencilstream_tpu.backends.strip_pass import StripPass
from stencilstream_tpu.core import cell_type, transition_function
from stencilstream_tpu.core.transition import static_field
from stencilstream_tpu.models import convection
from stencilstream_tpu.tdv import InlineTDV


def experiment():
    return convection.Experiment(
        lx=3.0, ly=1.0, px=1.5, py=0.5, eta0=1.0, DcT=1.0, deltaT=1.0,
        Ra=1e7, Pra=1e3, res=1024, iterMax=50000, nt=100, nout=10,
        nerr=100, epsilon=1e-4, dmp=2.0,
    )


# --------------------------------------------------------------------- #
# Folded cell: 11 physics fields + precomputed coordinate planes.       #
# Planes are loop-INVARIANT (never written by the kernel), so the       #
# framework elides their carry and HBM write stream automatically.      #
# --------------------------------------------------------------------- #
@cell_type
class FoldedCell:
    T: jnp.ndarray
    Pt: jnp.ndarray
    Vx: jnp.ndarray
    Vy: jnp.ndarray
    tau_xx: jnp.ndarray
    tau_yy: jnp.ndarray
    sigma_xy: jnp.ndarray
    dVxd_tau: jnp.ndarray
    dVyd_tau: jnp.ndarray
    ErrV: jnp.ndarray
    ErrP: jnp.ndarray
    # invariant planes
    m_v: jnp.ndarray        # bool: x<nx & y<ny+1
    m_p: jnp.ndarray        # bool: x<nx & y<ny
    m_sig: jnp.ndarray      # bool: m_p & x<nx-1 & y<ny-1
    c_pt: jnp.ndarray       # f32: m_p * delta_tau_iter/beta
    c_vx: jnp.ndarray       # f32: mask_x * delta_tau_iter
    a_vx: jnp.ndarray       # f32: 1 + mask_x*(dampX-1)
    c_vy: jnp.ndarray       # f32: mask_y * delta_tau_iter
    a_vy: jnp.ndarray       # f32: 1 + mask_y*(dampY-1)
    m_bx0: jnp.ndarray      # bool: mask_bcx & y==0
    m_bx1: jnp.ndarray      # bool: mask_bcx & y==ny-1
    m_by0: jnp.ndarray      # bool: mask_bcy & x==0
    m_by1: jnp.ndarray      # bool: mask_bcy & x==nx-1


def folded_planes(e, shape):
    nx, ny = e.nx, e.ny
    x = np.arange(shape[0])[:, None]
    y = np.arange(shape[1])[None, :]
    bb = lambda m: np.broadcast_to(m, shape)
    m_v = bb((x < nx) & (y < ny + 1))
    m_p = bb((x < nx) & (y < ny))
    m_sig = bb(m_p & (x < nx - 1) & (y < ny - 1))
    inner = (x >= 1) & (y >= 1)
    mask_x = bb(inner & (x < nx) & (y < ny - 1))
    mask_y = bb(inner & (x < nx - 1) & (y < ny))
    mask_bcx = (x < nx + 1) & (y < ny)
    mask_bcy = (x < nx) & (y < ny + 1)
    f32 = lambda m, v: (m * np.float32(v)).astype(np.float32)
    return dict(
        m_v=m_v, m_p=m_p, m_sig=m_sig,
        c_pt=f32(m_p, e.delta_tau_iter / e.beta),
        c_vx=f32(mask_x, e.delta_tau_iter),
        a_vx=(1.0 + mask_x * (e.dampX - 1.0)).astype(np.float32),
        c_vy=f32(mask_y, e.delta_tau_iter),
        a_vy=(1.0 + mask_y * (e.dampY - 1.0)).astype(np.float32),
        m_bx0=bb(mask_bcx & (y == 0)),
        m_bx1=bb(mask_bcx & (y == ny - 1)),
        m_by0=bb(mask_bcy & (x == 0)),
        m_by1=bb(mask_bcy & (x == nx - 1)),
    )


@transition_function
class FoldedPseudoTransientKernel:
    stencil_radius = 1
    n_subiterations = 3
    handles_boundary = True

    eta0: float = 0.0
    deltaT: float = 0.0
    delta_eta_delta_T: float = 0.0
    roh0_g_alpha: float = 0.0
    dx: float = 1.0
    dy: float = 1.0
    delta_tau_iter: float = 0.0
    rho: float = 1.0
    with_err: bool = static_field(default=True)

    def get_time_dependent_value(self, i):
        return None

    def __call__(self, s):
        c = s[0, 0]
        inv_dx, inv_dy = 1.0 / self.dx, 1.0 / self.dy
        inv_rho = 1.0 / self.rho

        if s.subiteration == 0:
            upd = {}
            if self.with_err:
                upd["ErrV"] = jnp.where(c.m_v, c.Vy, c.ErrV)
                upd["ErrP"] = jnp.where(c.m_p, c.Pt, c.ErrP)
            d_xa_vx = s[1, 0].Vx - c.Vx
            d_ya_vy = s[0, 1].Vy - c.Vy
            delta_V = d_xa_vx * inv_dx + d_ya_vy * inv_dy
            eta = self.eta0 * (
                1.0 - self.delta_eta_delta_T * (c.T + self.deltaT / 2.0)
            )
            # Folded: select -> plane FMA (c_pt is zero outside the mask).
            upd["Pt"] = c.Pt - c.c_pt * delta_V
            upd["tau_xx"] = jnp.where(
                c.m_p, 2.0 * eta * (d_xa_vx * inv_dx - (1.0 / 3.0) * delta_V),
                c.tau_xx,
            )
            upd["tau_yy"] = jnp.where(
                c.m_p, 2.0 * eta * (d_ya_vy * inv_dy - (1.0 / 3.0) * delta_V),
                c.tau_yy,
            )
            d_yi_vx = s[1, 1].Vx - s[1, 0].Vx
            d_xi_vy = s[1, 1].Vy - s[0, 1].Vy
            upd["sigma_xy"] = jnp.where(
                c.m_sig, eta * (d_yi_vx * inv_dy + d_xi_vy * inv_dx),
                c.sigma_xy,
            )
            return dataclasses.replace(c, **upd)

        if s.subiteration == 1:
            Rx = inv_rho * (
                (c.tau_xx - s[-1, 0].tau_xx) * inv_dx
                + (s[-1, 0].sigma_xy - s[-1, -1].sigma_xy) * inv_dy
                - (c.Pt - s[-1, 0].Pt) * inv_dx
            )
            # Folded: dV' = a_vx*dV + c_vx*Rx (plane coefficients);
            # V' = V + c_vx*dV' — all selects gone, bit-exact where active
            # (a=1, c=0 elsewhere).
            dVxd_tau = c.a_vx * c.dVxd_tau + c.c_vx * Rx
            Vx = c.Vx + c.c_vx * dVxd_tau
            Ry = inv_rho * (
                (c.tau_yy - s[0, -1].tau_yy) * inv_dy
                + (s[0, -1].sigma_xy - s[-1, -1].sigma_xy) * inv_dx
                - (c.Pt - s[0, -1].Pt) * inv_dy
                + self.roh0_g_alpha * ((s[0, -1].T + c.T) * 0.5)
            )
            dVyd_tau = c.a_vy * c.dVyd_tau + c.c_vy * Ry
            Vy = c.Vy + c.c_vy * dVyd_tau
            return dataclasses.replace(
                c, dVxd_tau=dVxd_tau, Vx=Vx, dVyd_tau=dVyd_tau, Vy=Vy
            )

        # sub 2: BCs + error update, with precomputed edge masks
        Vx = jnp.where(c.m_bx0, s[0, 1].Vx, c.Vx)
        Vx = jnp.where(c.m_bx1, s[0, -1].Vx, Vx)
        Vy = jnp.where(c.m_by0, s[1, 0].Vy, c.Vy)
        Vy = jnp.where(c.m_by1, s[-1, 0].Vy, Vy)
        upd = dict(Vx=Vx, Vy=Vy)
        if self.with_err:
            mask_bcy = c.m_v
            upd["ErrV"] = jnp.where(mask_bcy, c.ErrV - Vy, c.ErrV)
            upd["ErrP"] = jnp.where(c.m_p, c.ErrP - c.Pt, c.ErrP)
        return dataclasses.replace(c, **upd)


@transition_function
class FloorKernel:
    """Physics ops only — no masks/selects/BCs. WRONG at edges; measures the
    irreducible arithmetic+shift mix of one pseudo-transient iteration."""

    stencil_radius = 1
    n_subiterations = 3
    handles_boundary = True

    eta0: float = 0.0
    deltaT: float = 0.0
    delta_eta_delta_T: float = 0.0
    roh0_g_alpha: float = 0.0
    dx: float = 1.0
    dy: float = 1.0
    delta_tau_iter: float = 0.0
    beta: float = 1.0
    rho: float = 1.0
    dampX: float = 0.0
    dampY: float = 0.0

    def get_time_dependent_value(self, i):
        return None

    def __call__(self, s):
        c = s[0, 0]
        inv_dx, inv_dy = 1.0 / self.dx, 1.0 / self.dy
        if s.subiteration == 0:
            d_xa_vx = s[1, 0].Vx - c.Vx
            d_ya_vy = s[0, 1].Vy - c.Vy
            delta_V = d_xa_vx * inv_dx + d_ya_vy * inv_dy
            eta = self.eta0 * (
                1.0 - self.delta_eta_delta_T * (c.T + self.deltaT / 2.0)
            )
            return dataclasses.replace(
                c,
                Pt=c.Pt - self.delta_tau_iter / self.beta * delta_V,
                tau_xx=2.0 * eta * (d_xa_vx * inv_dx - (1.0 / 3.0) * delta_V),
                tau_yy=2.0 * eta * (d_ya_vy * inv_dy - (1.0 / 3.0) * delta_V),
                sigma_xy=eta * (
                    (s[1, 1].Vx - s[1, 0].Vx) * inv_dy
                    + (s[1, 1].Vy - s[0, 1].Vy) * inv_dx
                ),
            )
        if s.subiteration == 1:
            inv_rho = 1.0 / self.rho
            Rx = inv_rho * (
                (c.tau_xx - s[-1, 0].tau_xx) * inv_dx
                + (s[-1, 0].sigma_xy - s[-1, -1].sigma_xy) * inv_dy
                - (c.Pt - s[-1, 0].Pt) * inv_dx
            )
            dVxd_tau = self.dampX * c.dVxd_tau + Rx * self.delta_tau_iter
            Ry = inv_rho * (
                (c.tau_yy - s[0, -1].tau_yy) * inv_dy
                + (s[0, -1].sigma_xy - s[-1, -1].sigma_xy) * inv_dx
                - (c.Pt - s[0, -1].Pt) * inv_dy
                + self.roh0_g_alpha * ((s[0, -1].T + c.T) * 0.5)
            )
            dVyd_tau = self.dampY * c.dVyd_tau + Ry * self.delta_tau_iter
            return dataclasses.replace(
                c,
                dVxd_tau=dVxd_tau,
                Vx=c.Vx + dVxd_tau * self.delta_tau_iter,
                dVyd_tau=dVyd_tau,
                Vy=c.Vy + dVyd_tau * self.delta_tau_iter,
            )
        # sub 2: pure pass-through (BCs are edge-only work; the floor
        # measures the irreducible interior physics mix). Err fields become
        # invariant -> elided from carry and writes.
        return c


def build_arrays(e, variant):
    g = convection.init_grid(e)
    arrays = g.arrays
    shape = arrays.T.shape
    if variant in ("folded", "lean"):
        planes = folded_planes(e, shape)
        arrays = FoldedCell(
            **{f: getattr(arrays, f) for f in (
                "T", "Pt", "Vx", "Vy", "tau_xx", "tau_yy", "sigma_xy",
                "dVxd_tau", "dVyd_tau", "ErrV", "ErrP")},
            **{k: jnp.asarray(v) for k, v in planes.items()},
        )
    return arrays


def make_tf(e, variant):
    f = np.float32
    if variant == "prod":
        return convection.make_pseudo_transient_kernel(e)
    if variant == "prod_lean":
        # straight kernel, Err bookkeeping elided (round-4 with_err split)
        return convection.make_pseudo_transient_kernel(e, with_err=False)
    if variant in ("folded", "lean"):
        return FoldedPseudoTransientKernel(
            eta0=f(e.eta0), deltaT=f(e.deltaT),
            delta_eta_delta_T=f(e.delta_eta_delta_T),
            roh0_g_alpha=f(e.roh0_g_alpha), dx=f(e.dx), dy=f(e.dy),
            delta_tau_iter=f(e.delta_tau_iter), rho=f(e.rho),
            with_err=(variant == "folded"),
        )
    return FloorKernel(
        eta0=f(e.eta0), deltaT=f(e.deltaT),
        delta_eta_delta_T=f(e.delta_eta_delta_T),
        roh0_g_alpha=f(e.roh0_g_alpha), dx=f(e.dx), dy=f(e.dy),
        delta_tau_iter=f(e.delta_tau_iter), beta=f(e.beta), rho=f(e.rho),
        dampX=f(e.dampX), dampY=f(e.dampY),
    )


def halo_for(arrays):
    return jax.tree.map(lambda a: jnp.zeros((), a.dtype), arrays)


@functools.partial(jax.jit, static_argnames=("variant", "T", "p"))
def run(arrays, n_passes, tf, *, variant, T, p):
    # n_passes TRACED: one Mosaic compile serves every pass count.
    # tf rides as a pytree arg (registered dataclasses are unhashable).
    from stencilstream_tpu.backends.pallas_util import round_up
    H, W = jax.tree.leaves(arrays)[0].shape
    Ws = round_up(W, 128)
    # Pad rows to the sublane multiple exactly like _run_tiling does
    # (3071 is not 8-aligned; the clamped kernel wants an aligned carry).
    Hs = round_up(H, 8)
    halo = halo_for(arrays)
    arrays = jax.tree.map(
        lambda a: jnp.pad(a, ((0, Hs - H), (0, Ws - W))), arrays
    )
    k = tf.n_subiterations
    sp = StripPass(
        arrays,
        tf,
        halo,
        InlineTDV(),
        None,
        radius=1,
        n_subiterations=k,
        n_iterations=(1 << 20) * p,  # static; divisible by p
        iters_per_pass=p,
        strip_rows=T,
        grid_range=(H, W),
        mode="clamped",
        unroll=min(16, p),
    )
    out = lax.fori_loop(0, n_passes, lambda i, x: sp.run(x, i * p, 0), arrays)
    return jax.tree.map(lambda a: a[:H, :W], out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="prod,folded,lean,floor")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--p", type=int, default=16)
    ap.add_argument("--T", type=int, default=160)
    args = ap.parse_args()
    e = experiment()

    def sync(out):
        np.asarray(jax.tree.leaves(out)[0][0, 0])

    if args.check:
        # folded must be BIT-exact vs prod on the physics fields
        p = 4
        a_prod = run(build_arrays(e, "prod"), 2, make_tf(e, "prod"),
                     variant="prod", T=args.T, p=p)
        a_fold = run(build_arrays(e, "folded"), 2, make_tf(e, "folded"),
                     variant="folded", T=args.T, p=p)
        for f in ("T", "Pt", "Vx", "Vy", "tau_xx", "tau_yy", "sigma_xy",
                  "dVxd_tau", "dVyd_tau", "ErrV", "ErrP"):
            pa = np.asarray(getattr(a_prod, f))
            fa = np.asarray(getattr(a_fold, f))
            n_bad = int((pa != fa).sum())
            print(f"{f}: {'OK' if n_bad == 0 else f'{n_bad} mismatches'}",
                  flush=True)
            assert n_bad == 0, f
        print("folded == prod bit-exact", flush=True)
        return

    for variant in args.variants.split(","):
        label = f"{variant:7s} T={args.T} p={args.p}"
        try:
            arrays = build_arrays(e, variant)
            tf = make_tf(e, variant)
            cells = arrays.T.shape[0] * arrays.T.shape[1]
            iters = 4096
            n1 = max(iters // args.p // 4, 1)
            n2 = max(iters // args.p, 2)
            f = lambda n: run(arrays, n, tf, variant=variant, T=args.T,
                              p=args.p)
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
            gc = cells * (n2 - n1) * args.p / (w2 - w1) / 1e9
            print(f"{label}: {gc:6.2f} GCell/s marginal "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as ex:
            print(f"{label}: FAILED {type(ex).__name__}: "
                  f"{str(ex).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
