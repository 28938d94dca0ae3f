"""Pallas TPU kernels for the multiphase non-Newtonian (HBP) force pipeline.

The reference NN solver is a multi-pass loop family
(`src_mphase/DSPH_v5.0_NNewtonian/source/JSphCpu_NN_SPH.cpp:663-695`):
(1) PressGrad — pressure gradient + continuity + DDT + velocity-gradient
accumulation with per-phase mass/EOS; (2) an elementwise pass turning the
strain rate into an HBP effective viscosity; (3) Morris laminar or full
constitutive-equation (stress divergence) viscous forces.  Here passes 1 and
3 run as fused pair kernels over the same row-window machinery as the
single-phase path (cellforce._window_loop, amortized RowDiv layout); pass 2
stays an XLA elementwise pass.  Per-phase quantities (press, mass, cbar,
eta, tau) are precomputed into per-particle channels so the kernel's inner
loop does no table lookups.

The FDA velocity-gradient formulation (Interaction_ForcesCpuT_NN_FDA,
JSphCpu_NN_FDA.cpp) fuses per-pair strain -> HBP eta -> viscous force into
the pass-1 kernel (_kernel_fda) — one exp + one pow per pair lane.  The
jnp bucket implementation (ops/forces_nn.py) remains the oracle."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import typesdef as td
from ...typesdef import CteSph, TpBoundary, TpDensity, TpKernel, TpVisco
from .. import celldiv as cd
from .. import forces_nn as NN
from ..forces import Forces, SolverOpts
from . import cellforce as CF

# pass-1 channels
(_CX, _CY, _CZ, _CVX, _CVY, _CVZ, _CRHO, _CPRESS, _CINVRHO, _CKIND,
 _CMASS, _CCBAR, _CPHASE) = range(13)
C1 = 16

# FDA single-pass channels: pass-1 layout + per-particle rheology constants
# (each particle carries its phase's HBP params so the kernel's per-pair
# eta needs no table lookups; JSphCpu_NN_FDA.cpp:291 keys tau_yield/visco/
# m/n by pp2 — pp1 when the candidate is bound — and tau_max/Bi_multi by pp1)
(_CRVISC, _CRTAUY, _CRHBPM, _CRHBPN, _CRTAUMAX, _CRBIMUL) = range(13, 19)
CF1 = 24

# pass-3 channels (mode-dependent layout, all fit 16)
P3_MORRIS = dict(X=0, Y=1, Z=2, VX=3, VY=4, VZ=5, INVRHO=6, KIND=7,
                 MASS=8, ETA=9)
P3_CONSEQ = dict(X=0, Y=1, Z=2, INVRHO=3, KIND=4, MASS=5, TAU=6)
P3_ART = dict(X=0, Y=1, Z=2, VX=3, VY=4, VZ=5, RHO=6, KIND=7, MASS=8,
              CBAR=9, VNN=10)
C3 = 16


def supports_nn(csp: CteSph, opts: SolverOpts) -> bool:
    """Both velocity-gradient formulations: SPH (3-pass) with artificial /
    Morris / constitutive-equation viscosity, and FDA (single fused pass,
    _kernel_fda) with Morris / ConsEq.  Symmetry falls back to the jnp
    path."""
    if opts.tboundary != TpBoundary.DBC or opts.symmetry:
        return False
    # FDA + artificial viscosity does not use the gradient at all, so it
    # rides the same nn1+nn3 pipeline as SPH (matching forces_nn's use_fda
    # gate); FDA + Morris/ConsEq takes the fused single-pass kernel
    return opts.tvisco in (TpVisco.ARTIFICIAL, TpVisco.LAMINAR_SPS,
                           TpVisco.CONST_EQ)


def _co1(opts) -> int:
    used = 7 + 6 + (5 if opts.shiftmode.value != 0 else 0)
    return -(-used // 8) * 8


def _kernel_nn1(tcount_s, wstart_s, wcount_s, visco_s, tgt_ref, sf_ref,
                out_ref, cwin, sem, *, csp: CteSph, opts: SolverOpts,
                R: int, T: int, W: int, CW: int, CO: int, C: int,
                SA: int = 2, K: int = 1):
    """Pass 1 — PressGrad (p1_body of forces_nn, JSphCpu_NN_SPH.cpp:452):
    pressure force, continuity, DDT (per-candidate cbar + same-phase
    gating), shifting (heavy-phase gating), viscdt, velocity gradients with
    the no-slip wall trick."""
    def make_phys(tc, kk=0):
        tgt = tgt_ref[kk]
        trowv = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) < tc
        tx, ty, tz = tgt[:, _CX:_CX + 1], tgt[:, _CY:_CY + 1], tgt[:, _CZ:_CZ + 1]
        tvx, tvy, tvz = (tgt[:, _CVX:_CVX + 1], tgt[:, _CVY:_CVY + 1],
                         tgt[:, _CVZ:_CVZ + 1])
        trho = jnp.where(trowv, tgt[:, _CRHO:_CRHO + 1], 1.0)
        tpress = jnp.where(trowv, tgt[:, _CPRESS:_CPRESS + 1], 0.0)
        inv_trho = jnp.where(trowv, tgt[:, _CINVRHO:_CINVRHO + 1], 1.0)
        tkind = tgt[:, _CKIND:_CKIND + 1]
        tmass = tgt[:, _CMASS:_CMASS + 1]
        tphase = tgt[:, _CPHASE:_CPHASE + 1]
        bound_t = tkind < 1.5

        h = jnp.float32(csp.kernelh)
        inv_h = jnp.float32(1.0 / csp.kernelh)
        bwen_h = jnp.float32(csp.kwend.bwen / csp.kernelh)
        ks2 = jnp.float32(csp.kernelsize2)
        eta2 = jnp.float32(csp.eta2)
        ddtkh = jnp.float32(csp.ddtkh)

        zTC = jnp.zeros((T, CW), jnp.float32)
        use_shift = opts.shiftmode.value != 0
        nacc = 6 + 6 + (5 if use_shift else 0)
        init = tuple([zTC] * nacc) + (
            jnp.full((T, CW), -3.4e38, jnp.float32),)

        def chunk_fn(cw, clanev, acc2):
            rest = list(acc2)
            ax, ay, az, ar_, dlt, dblk = rest[:6]
            gxx, gxy, gxz, gyy, gyz, gzz = rest[6:12]
            k = 12
            if use_shift:
                shx, shy, shz, shc, shb = rest[k:k + 5]
                k += 5
            vmax = rest[-1]
            cx, cy, cz = cw[_CX:_CX + 1, :], cw[_CY:_CY + 1, :], cw[_CZ:_CZ + 1, :]
            cvx, cvy, cvz = (cw[_CVX:_CVX + 1, :], cw[_CVY:_CVY + 1, :],
                             cw[_CVZ:_CVZ + 1, :])
            crho = jnp.where(clanev, cw[_CRHO:_CRHO + 1, :], 1.0)
            cpress = jnp.where(clanev, cw[_CPRESS:_CPRESS + 1, :], 0.0)
            inv_crho = jnp.where(clanev, cw[_CINVRHO:_CINVRHO + 1, :], 1.0)
            ckind = cw[_CKIND:_CKIND + 1, :]
            mass2 = cw[_CMASS:_CMASS + 1, :]
            ccbar = cw[_CCBAR:_CCBAR + 1, :]
            cphase = cw[_CPHASE:_CPHASE + 1, :]
            bound_c = ckind < 1.5

            dx, dy, dz = tx - cx, ty - cy, tz - cz
            rr2 = dx * dx + dy * dy + dz * dz
            pair = (trowv & clanev & (rr2 <= ks2) & ~(bound_t & bound_c))
            pw = pair.astype(jnp.float32)
            fac, rad, qq = CF._kernel_fac(csp, rr2, h, inv_h, bwen_h)

            dvx, dvy, dvz = tvx - cvx, tvy - cvy, tvz - cvz
            dot = dx * dvx + dy * dvy + dz * dvz
            dvfr = fac * dot
            drfr = fac * rr2
            inv_rr2e = pl.reciprocal(rr2 + eta2, approx=False)

            # pressure force (multi-EOS: per-particle press channels)
            prs = (tpress + cpress) * (inv_trho * inv_crho)
            if csp.tkernel == TpKernel.CUBIC:
                kc = csp.kcubic
                w_out = jnp.float32(kc.a24) * (2.0 - qq) ** 3
                w_in = jnp.float32(kc.a2) * (1.0 + (0.75 * qq - 1.5) * qq * qq)
                wab = jnp.where(rad > h, w_out, w_in)
                fab = wab * jnp.float32(kc.od_wdeltap)
                fab = fab * fab
                fab = fab * fab
                t1 = (tpress * (inv_trho * inv_trho)
                      * jnp.where(tpress > 0, 0.01, -0.2))
                t2 = (cpress * (inv_crho * inv_crho)
                      * jnp.where(cpress > 0, 0.01, -0.2))
                prs = prs + fab * (t1 + t2)
            pm2 = pw * mass2
            w_momm = pm2 * jnp.where(bound_t, 0.0, 1.0)
            cf = -w_momm * prs * fac
            ax = ax + cf * dx
            ay = ay + cf * dy
            az = az + cf * dz

            # continuity (pass-1 w_comp: bound-bound already excluded)
            ar_ = ar_ + pm2 * dvfr * (trho * inv_crho)

            # density diffusion with per-candidate cbar + same-phase gating
            samephase = (tphase == cphase) | bound_c
            w_mom = pw * jnp.where(bound_t, 0.0, 1.0)
            if opts.tdensity == TpDensity.MOLTENI:
                vd = ddtkh * ccbar * (trho * inv_crho - 1.0) * inv_rr2e
                gate = (samephase & ~bound_c).astype(jnp.float32)
                dlt = dlt + w_mom * gate * vd * drfr * mass2
                if opts.tboundary == TpBoundary.DBC:
                    dblk = dblk + w_mom * (~bound_t & bound_c).astype(
                        jnp.float32)
            elif opts.tdensity in (TpDensity.FOURTAKAS,
                                   TpDensity.FOURTAKAS_FULL):
                ag = 1.0 / csp.gamma
                gz = csp.ddtgz
                c1c = jnp.float32(csp.rhopzero * ag * gz)
                c2c = jnp.float32(csp.rhopzero * ag * (ag - 1.0) * 0.5
                                  * gz * gz)
                c3c = jnp.float32(csp.rhopzero * ag * (ag - 1.0)
                                  * (ag - 2.0) / 6.0 * gz * gz * gz)
                drhop = dz * (c1c + dz * (c2c + dz * c3c))
                vd = (ddtkh * ccbar) * ((crho - trho) - drhop) * inv_rr2e
                gate = (samephase & ~bound_c).astype(jnp.float32)
                dlt = dlt - w_mom * gate * vd * drfr * mass2 * inv_crho
                if opts.tdensity == TpDensity.FOURTAKAS:
                    # FULL applies the diffusion near walls (no blocking)
                    dblk = dblk + w_mom * (~bound_t & bound_c).astype(
                        jnp.float32)

            if use_shift:
                heavy = (tmass > mass2) & (tphase != cphase) & ~bound_c
                massrhop = jnp.where(heavy, 0.0, w_mom * mass2 * inv_crho)
                frx, fry, frz = fac * dx, fac * dy, fac * dz
                shx = shx + massrhop * frx
                shy = shy + massrhop * fry
                shz = shz + massrhop * frz
                shc = shc - massrhop * drfr
                if opts.shiftmode.value == 1:
                    shb = shb + (pair & ~bound_t & bound_c).astype(jnp.float32)

            vmax = jnp.maximum(vmax, jnp.where(pair, dot * inv_rr2e, -3.4e38))

            # velocity gradients with the no-slip wall trick (dv=2*v1 for
            # bound candidates; GetVelocityGradients_SPH_tsym)
            bcf = bound_c.astype(jnp.float32)
            dvwx = dvx * (1.0 - bcf) + (2.0 * tvx) * bcf
            dvwy = dvy * (1.0 - bcf) + (2.0 * tvy) * bcf
            dvwz = dvz * (1.0 - bcf) + (2.0 * tvz) * bcf
            volp2 = -w_momm * inv_crho
            gvx, gvy, gvz = dvwx * volp2, dvwy * volp2, dvwz * volp2
            ffx, ffy, ffz = fac * dx, fac * dy, fac * dz
            gxx = gxx + gvx * ffx
            gxy = gxy + gvx * ffy + gvy * ffx
            gxz = gxz + gvx * ffz + gvz * ffx
            gyy = gyy + gvy * ffy
            gyz = gyz + gvy * ffz + gvz * ffy
            gzz = gzz + gvz * ffz

            outacc = [ax, ay, az, ar_, dlt, dblk, gxx, gxy, gxz, gyy, gyz,
                      gzz]
            if use_shift:
                outacc += [shx, shy, shz, shc, shb]
            return tuple(outacc) + (vmax,)

        def finish(accs):
            red = lambda x: jnp.sum(x, axis=1, keepdims=True)
            cols = [red(a_) for a_ in accs[:-1]]
            vcol = jnp.maximum(jnp.max(accs[-1], axis=1, keepdims=True), 0.0)
            # layout: [ax ay az ar delta dblk visc g0..g5 (shift5)] + pad
            cols = cols[:6] + [vcol] + cols[6:]
            return jnp.concatenate(
                cols + [jnp.zeros((T, CO - len(cols)), jnp.float32)], axis=1)

        return init, chunk_fn, finish

    CF._window_loop(tcount_s, wstart_s, wcount_s, sf_ref, out_ref, cwin, sem,
                    make_phys, R=R, T=T, W=W, CW=CW, CO=CO, SA=SA, K=K)


def _kernel_fda(tcount_s, wstart_s, wcount_s, visco_s, tgt_ref, sf_ref,
                out_ref, cwin, sem, *, csp: CteSph, opts: SolverOpts,
                R: int, T: int, W: int, CW: int, CO: int, C: int,
                SA: int = 2, K: int = 1):
    """FDA single-pass NN interaction (Interaction_ForcesCpuT_NN_FDA,
    JSphCpu_NN_FDA.cpp:129-348): pass-1 physics (pressure/continuity/DDT/
    shifting/viscdt) plus the per-pair FDA velocity gradient -> deviatoric
    strain -> HBP effective viscosity -> Morris or ConsEq viscous force,
    all fused in one sweep (no gradient accumulation pass, no second
    kernel).  The per-pair eta costs one exp + one pow per lane — cheap on
    the VPU relative to the window DMA that dominates the block."""
    morris = opts.tvisco == TpVisco.LAMINAR_SPS

    def make_phys(tc, kk=0):
        tgt = tgt_ref[kk]
        trowv = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) < tc
        tx, ty, tz = tgt[:, _CX:_CX + 1], tgt[:, _CY:_CY + 1], tgt[:, _CZ:_CZ + 1]
        tvx, tvy, tvz = (tgt[:, _CVX:_CVX + 1], tgt[:, _CVY:_CVY + 1],
                         tgt[:, _CVZ:_CVZ + 1])
        trho = jnp.where(trowv, tgt[:, _CRHO:_CRHO + 1], 1.0)
        tpress = jnp.where(trowv, tgt[:, _CPRESS:_CPRESS + 1], 0.0)
        inv_trho = jnp.where(trowv, tgt[:, _CINVRHO:_CINVRHO + 1], 1.0)
        tkind = tgt[:, _CKIND:_CKIND + 1]
        tmass = tgt[:, _CMASS:_CMASS + 1]
        tphase = tgt[:, _CPHASE:_CPHASE + 1]
        tvisc = tgt[:, _CRVISC:_CRVISC + 1]
        ttauy = tgt[:, _CRTAUY:_CRTAUY + 1]
        thbpm = tgt[:, _CRHBPM:_CRHBPM + 1]
        thbpn = tgt[:, _CRHBPN:_CRHBPN + 1]
        ttaumax = tgt[:, _CRTAUMAX:_CRTAUMAX + 1]
        tbimul = tgt[:, _CRBIMUL:_CRBIMUL + 1]
        bound_t = tkind < 1.5

        h = jnp.float32(csp.kernelh)
        inv_h = jnp.float32(1.0 / csp.kernelh)
        bwen_h = jnp.float32(csp.kwend.bwen / csp.kernelh)
        ks2 = jnp.float32(csp.kernelsize2)
        eta2 = jnp.float32(csp.eta2)
        ddtkh = jnp.float32(csp.ddtkh)
        eps = jnp.float32(td.ALMOSTZERO)

        zTC = jnp.zeros((T, CW), jnp.float32)
        use_shift = opts.shiftmode.value != 0
        nacc = 6 + (5 if use_shift else 0)
        init = tuple([zTC] * nacc) + (
            jnp.full((T, CW), -3.4e38, jnp.float32), zTC)

        def chunk_fn(cw, clanev, acc2):
            rest = list(acc2)
            ax, ay, az, ar_, dlt, dblk = rest[:6]
            k = 6
            if use_shift:
                shx, shy, shz, shc, shb = rest[k:k + 5]
                k += 5
            vmax, etamax = rest[-2], rest[-1]
            cx, cy, cz = cw[_CX:_CX + 1, :], cw[_CY:_CY + 1, :], cw[_CZ:_CZ + 1, :]
            cvx, cvy, cvz = (cw[_CVX:_CVX + 1, :], cw[_CVY:_CVY + 1, :],
                             cw[_CVZ:_CVZ + 1, :])
            crho = jnp.where(clanev, cw[_CRHO:_CRHO + 1, :], 1.0)
            cpress = jnp.where(clanev, cw[_CPRESS:_CPRESS + 1, :], 0.0)
            inv_crho = jnp.where(clanev, cw[_CINVRHO:_CINVRHO + 1, :], 1.0)
            ckind = cw[_CKIND:_CKIND + 1, :]
            mass2 = cw[_CMASS:_CMASS + 1, :]
            ccbar = cw[_CCBAR:_CCBAR + 1, :]
            cphase = cw[_CPHASE:_CPHASE + 1, :]
            bound_c = ckind < 1.5
            bcf = bound_c.astype(jnp.float32)

            dx, dy, dz = tx - cx, ty - cy, tz - cz
            rr2 = dx * dx + dy * dy + dz * dz
            pair = (trowv & clanev & (rr2 <= ks2) & ~(bound_t & bound_c))
            pw = pair.astype(jnp.float32)
            fac, rad, qq = CF._kernel_fac(csp, rr2, h, inv_h, bwen_h)

            dvx, dvy, dvz = tvx - cvx, tvy - cvy, tvz - cvz
            dot = dx * dvx + dy * dvy + dz * dvz
            dvfr = fac * dot
            drfr = fac * rr2
            inv_rr2e = pl.reciprocal(rr2 + eta2, approx=False)

            # pressure force (multi-EOS: per-particle press channels)
            prs = (tpress + cpress) * (inv_trho * inv_crho)
            if csp.tkernel == TpKernel.CUBIC:
                kc = csp.kcubic
                w_out = jnp.float32(kc.a24) * (2.0 - qq) ** 3
                w_in = jnp.float32(kc.a2) * (1.0 + (0.75 * qq - 1.5) * qq * qq)
                wab = jnp.where(rad > h, w_out, w_in)
                fab = wab * jnp.float32(kc.od_wdeltap)
                fab = fab * fab
                fab = fab * fab
                t1 = (tpress * (inv_trho * inv_trho)
                      * jnp.where(tpress > 0, 0.01, -0.2))
                t2 = (cpress * (inv_crho * inv_crho)
                      * jnp.where(cpress > 0, 0.01, -0.2))
                prs = prs + fab * (t1 + t2)
            pm2 = pw * mass2
            w_momm = pm2 * jnp.where(bound_t, 0.0, 1.0)
            cf = -w_momm * prs * fac
            ax = ax + cf * dx
            ay = ay + cf * dy
            az = az + cf * dz

            # continuity
            ar_ = ar_ + pm2 * dvfr * (trho * inv_crho)

            # density diffusion (same layout as _kernel_nn1)
            samephase = (tphase == cphase) | bound_c
            w_mom = pw * jnp.where(bound_t, 0.0, 1.0)
            if opts.tdensity == TpDensity.MOLTENI:
                vd = ddtkh * ccbar * (trho * inv_crho - 1.0) * inv_rr2e
                gate = (samephase & ~bound_c).astype(jnp.float32)
                dlt = dlt + w_mom * gate * vd * drfr * mass2
                if opts.tboundary == TpBoundary.DBC:
                    dblk = dblk + w_mom * (~bound_t & bound_c).astype(
                        jnp.float32)
            elif opts.tdensity in (TpDensity.FOURTAKAS,
                                   TpDensity.FOURTAKAS_FULL):
                ag = 1.0 / csp.gamma
                gzc = csp.ddtgz
                c1c = jnp.float32(csp.rhopzero * ag * gzc)
                c2c = jnp.float32(csp.rhopzero * ag * (ag - 1.0) * 0.5
                                  * gzc * gzc)
                c3c = jnp.float32(csp.rhopzero * ag * (ag - 1.0)
                                  * (ag - 2.0) / 6.0 * gzc * gzc * gzc)
                drhop = dz * (c1c + dz * (c2c + dz * c3c))
                vd = (ddtkh * ccbar) * ((crho - trho) - drhop) * inv_rr2e
                gate = (samephase & ~bound_c).astype(jnp.float32)
                dlt = dlt - w_mom * gate * vd * drfr * mass2 * inv_crho
                if opts.tdensity == TpDensity.FOURTAKAS:
                    dblk = dblk + w_mom * (~bound_t & bound_c).astype(
                        jnp.float32)

            if use_shift:
                heavy = (tmass > mass2) & (tphase != cphase) & ~bound_c
                massrhop = jnp.where(heavy, 0.0, w_mom * mass2 * inv_crho)
                frx, fry, frz = fac * dx, fac * dy, fac * dz
                shx = shx + massrhop * frx
                shy = shy + massrhop * fry
                shz = shz + massrhop * frz
                shc = shc - massrhop * drfr
                if opts.shiftmode.value == 1:
                    shb = shb + (pair & ~bound_t & bound_c).astype(jnp.float32)

            vmax = jnp.maximum(vmax, jnp.where(pair, dot * inv_rr2e, -3.4e38))

            # ---- fused FDA viscosity ------------------------------------
            # no-slip wall trick
            dvwx = dvx * (1.0 - bcf) + (2.0 * tvx) * bcf
            dvwy = dvy * (1.0 - bcf) + (2.0 * tvy) * bcf
            dvwz = dvz * (1.0 - bcf) + (2.0 * tvz) * bcf
            # per-pair velocity gradient dvel = dvw (outer) dr / rr2, then
            # deviatoric strain invariants (strain_magn_pair; the FULL-matrix
            # |II_1 - II_2| magnitude quirk reproduced for parity)
            inv_rr2 = pl.reciprocal(jnp.maximum(rr2, eps), approx=False)
            d11 = dvwx * dx * inv_rr2
            d12 = dvwx * dy * inv_rr2
            d13 = dvwx * dz * inv_rr2
            d21 = dvwy * dx * inv_rr2
            d22 = dvwy * dy * inv_rr2
            d23 = dvwy * dz * inv_rr2
            d31 = dvwz * dx * inv_rr2
            d32 = dvwz * dy * inv_rr2
            d33 = dvwz * dz * inv_rr2
            divv = (d11 + d22 + d33) * jnp.float32(1.0 / 3.0)
            sxx, syy, szz = d11 - divv, d22 - divv, d33 - divv
            sxy = 0.5 * (d12 + d21)
            sxz = 0.5 * (d13 + d31)
            syz = 0.5 * (d23 + d32)
            ii1 = sxx * syy + syy * szz + sxx * szz
            ii2 = sxy * sxy + syz * syz + sxz * sxz
            magn = jnp.abs(ii1 - ii2)

            # HBP effective viscosity (eta_effective): rheology from the
            # candidate's phase — the target's when the candidate is bound;
            # tau_max/Bi_multi always from the target (pp1)
            cvisc = jnp.where(bound_c, tvisc, cw[_CRVISC:_CRVISC + 1, :])
            ctauy = jnp.where(bound_c, ttauy, cw[_CRTAUY:_CRTAUY + 1, :])
            chbpm = jnp.where(bound_c, thbpm, cw[_CRHBPM:_CRHBPM + 1, :])
            chbpn = jnp.where(bound_c, thbpn, cw[_CRHBPN:_CRHBPN + 1, :])
            dm = jnp.maximum(magn, eps)
            inv_2dm = pl.reciprocal(2.0 * dm, approx=False)
            has_tm = ttaumax > 0
            miou_yield = jnp.where(has_tm, ttaumax, ctauy) * inv_2dm
            bi_region = has_tm & (dm * (2.0 * jnp.maximum(tbimul * cvisc,
                                                          eps)) <= ttaumax)
            miou_yield = jnp.where(bi_region, tbimul * cvisc, miou_yield)
            miou_pap = miou_yield * (1.0 - jnp.exp(-chbpm * dm))
            low_rate = (miou_pap > chbpm * ctauy) | (magn <= eps)
            term1 = jnp.where(has_tm, miou_yield,
                              jnp.where(low_rate, chbpm * ctauy, miou_pap))
            miou_hb = cvisc * jnp.exp((chbpn - 1.0) * jnp.log(dm))
            term2 = jnp.where(bi_region | low_rate, cvisc, miou_hb)
            eta = term1 + term2
            etamax = jnp.maximum(
                etamax, jnp.where(pair & ~bound_t, eta, 0.0))

            if morris:
                # Morris with the per-pair eta (JSphCpu_NN_FDA.cpp:297-299)
                vtemp = w_momm * (2.0 * eta) * inv_rr2e * inv_crho * drfr
                ax = ax + vtemp * dvwx
                ay = ay + vtemp * dvwy
                az = az + vtemp * dvwz
            else:
                # ConsEq: per-pair stress tau = 2*eta*D (:301-312)
                frx, fry, frz = fac * dx, fac * dy, fac * dz
                m2r = w_momm * inv_crho * (2.0 * eta)
                ax = ax + m2r * (sxx * frx + sxy * fry + sxz * frz)
                ay = ay + m2r * (sxy * frx + syy * fry + syz * frz)
                az = az + m2r * (sxz * frx + syz * fry + szz * frz)

            outacc = [ax, ay, az, ar_, dlt, dblk]
            if use_shift:
                outacc += [shx, shy, shz, shc, shb]
            return tuple(outacc) + (vmax, etamax)

        def finish(accs):
            red = lambda x: jnp.sum(x, axis=1, keepdims=True)
            cols = [red(a_) for a_ in accs[:-2]]
            vcol = jnp.maximum(jnp.max(accs[-2], axis=1, keepdims=True), 0.0)
            ecol = jnp.max(accs[-1], axis=1, keepdims=True)
            # layout: [ax ay az ar delta dblk visc etamax (shift5)] + pad
            cols = cols[:6] + [vcol, ecol] + cols[6:]
            return jnp.concatenate(
                cols + [jnp.zeros((T, CO - len(cols)), jnp.float32)], axis=1)

        return init, chunk_fn, finish

    CF._window_loop(tcount_s, wstart_s, wcount_s, sf_ref, out_ref, cwin, sem,
                    make_phys, R=R, T=T, W=W, CW=CW, CO=CO, SA=SA, K=K)


def _kernel_nn3(tcount_s, wstart_s, wcount_s, visco_s, tgt_ref, sf_ref,
                out_ref, cwin, sem, *, csp: CteSph, opts: SolverOpts,
                R: int, T: int, W: int, CW: int, CO: int, C: int,
                SA: int = 2, K: int = 1):
    """Pass 3 — viscous forces: Morris with per-particle effective viscosity
    (p3_body morris, JSphCpu_NN_SPH.cpp:336), ConsEq stress divergence
    (:228), or per-phase artificial viscosity (p3a_body)."""
    morris = opts.tvisco == TpVisco.LAMINAR_SPS
    conseq = opts.tvisco == TpVisco.CONST_EQ
    L = P3_MORRIS if morris else (P3_CONSEQ if conseq else P3_ART)

    def make_phys(tc, kk=0):
        tgt = tgt_ref[kk]
        trowv = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) < tc

        def tcol(c):
            return tgt[:, c:c + 1]

        tx, ty, tz = tcol(L["X"]), tcol(L["Y"]), tcol(L["Z"])
        tkind = tcol(L["KIND"])
        bound_t = tkind < 1.5
        h = jnp.float32(csp.kernelh)
        inv_h = jnp.float32(1.0 / csp.kernelh)
        bwen_h = jnp.float32(csp.kwend.bwen / csp.kernelh)
        ks2 = jnp.float32(csp.kernelsize2)
        eta2 = jnp.float32(csp.eta2)

        zTC = jnp.zeros((T, CW), jnp.float32)
        init = (zTC, zTC, zTC)

        def chunk_fn(cw, clanev, acc2):
            ax, ay, az = acc2

            def ccol(c, fill=None):
                col = cw[c:c + 1, :]
                if fill is None:
                    return col
                return jnp.where(clanev, col, fill)

            cx, cy, cz = ccol(L["X"]), ccol(L["Y"]), ccol(L["Z"])
            ckind = ccol(L["KIND"])
            bound_c = ckind < 1.5
            mass2 = ccol(L["MASS"])
            dx, dy, dz = tx - cx, ty - cy, tz - cz
            rr2 = dx * dx + dy * dy + dz * dz
            pair = (trowv & clanev & (rr2 <= ks2) & ~(bound_t & bound_c))
            fac, rad, qq = CF._kernel_fac(csp, rr2, h, inv_h, bwen_h)
            w_momm = pair.astype(jnp.float32) * mass2 \
                * jnp.where(bound_t, 0.0, 1.0)
            inv_rr2e = pl.reciprocal(rr2 + eta2, approx=False)
            bcf = bound_c.astype(jnp.float32)

            if morris:
                tvx, tvy, tvz = tcol(L["VX"]), tcol(L["VY"]), tcol(L["VZ"])
                cvx, cvy, cvz = ccol(L["VX"]), ccol(L["VY"]), ccol(L["VZ"])
                inv_crho = ccol(L["INVRHO"], 1.0)
                teta = tcol(L["ETA"])
                ceta = ccol(L["ETA"])
                eta_pair = teta + jnp.where(bound_c, teta, ceta)
                drfr = fac * rr2
                vtemp = w_momm * eta_pair * inv_rr2e * inv_crho * drfr
                dvwx = (tvx - cvx) * (1.0 - bcf) + (2.0 * tvx) * bcf
                dvwy = (tvy - cvy) * (1.0 - bcf) + (2.0 * tvy) * bcf
                dvwz = (tvz - cvz) * (1.0 - bcf) + (2.0 * tvz) * bcf
                ax = ax + vtemp * dvwx
                ay = ay + vtemp * dvwy
                az = az + vtemp * dvwz
            elif conseq:
                inv_crho = ccol(L["INVRHO"], 1.0)
                TAU = L["TAU"]
                m2r = w_momm * inv_crho
                frx, fry, frz = fac * dx, fac * dy, fac * dz
                ts = [tcol(TAU + i) + jnp.where(bound_c, tcol(TAU + i),
                                                ccol(TAU + i))
                      for i in range(6)]
                ax = ax + m2r * (ts[0] * frx + ts[1] * fry + ts[2] * frz)
                ay = ay + m2r * (ts[1] * frx + ts[3] * fry + ts[4] * frz)
                az = az + m2r * (ts[2] * frx + ts[4] * fry + ts[5] * frz)
            else:
                # per-phase artificial viscosity (VISCO_Artificial branch:
                # visco_NN = PhaseCte[pp2].visco as a per-particle channel)
                tvx, tvy, tvz = tcol(L["VX"]), tcol(L["VY"]), tcol(L["VZ"])
                cvx, cvy, cvz = ccol(L["VX"]), ccol(L["VY"]), ccol(L["VZ"])
                trho = jnp.where(trowv, tcol(L["RHO"]), 1.0)
                crho = ccol(L["RHO"], 1.0)
                ccb = ccol(L["CBAR"])
                vnn = ccol(L["VNN"])
                dot = (dx * (tvx - cvx) + dy * (tvy - cvy)
                       + dz * (tvz - cvz))
                amubar = h * dot * inv_rr2e
                inv_robar = 2.0 * pl.reciprocal(trho + crho, approx=False)
                pi = jnp.where(dot < 0,
                               (-vnn * ccb) * amubar * inv_robar, 0.0)
                cfc = -w_momm * pi * fac
                ax = ax + cfc * dx
                ay = ay + cfc * dy
                az = az + cfc * dz
            return ax, ay, az

        def finish(accs):
            cols = [jnp.sum(a_, axis=1, keepdims=True) for a_ in accs]
            return jnp.concatenate(
                cols + [jnp.zeros((T, CO - 3), jnp.float32)], axis=1)

        return init, chunk_fn, finish

    CF._window_loop(tcount_s, wstart_s, wcount_s, sf_ref, out_ref, cwin, sem,
                    make_phys, R=R, T=T, W=W, CW=CW, CO=CO, SA=SA, K=K)


def _call_rows(kern, rd: "cd.RowDiv", dom, chans, C, CO, interpret):
    """Shared launch glue: pack channels, build shifted copies + target
    tiles (free reshapes in the row-padded layout), chunk the block tables
    to SMEM capacity, run, return (NP, CO)."""
    NP = rd.ncap
    T, W = CF.tiles_rows(dom)
    A = NP // T
    R = rd.wstart.shape[1]
    packed = jnp.stack(chans, axis=0)
    packed = jnp.pad(packed, ((0, C - packed.shape[0]), (0, 0)))
    sf = jnp.stack([jnp.pad(packed, ((0, 0), (k * CF.GSHIFT,
                                              W + CF.CW - k * CF.GSHIFT)))
                    for k in range(CF.NSHIFT)], axis=0)
    tgt = jnp.transpose(packed, (1, 0)).reshape(A, T, C)

    K = CF.kblocks()
    CA = min(CF._round_up(A, max(8, K)), 8192)
    nchunk = -(-A // CA)
    padA = nchunk * CA - A
    tcount = jnp.pad(rd.tcount, (0, padA))
    wstart = jnp.pad(rd.wstart, ((0, padA), (0, 0)))
    wcount = jnp.pad(rd.wcount, ((0, padA), (0, 0)))
    tgt = jnp.pad(tgt, ((0, padA), (0, 0), (0, 0)))
    viscov = jnp.zeros((1,), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(CA // K,),
        in_specs=[
            pl.BlockSpec((K, T, C), lambda a, *_: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((K, T, CO), lambda a, *_: (a, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K * R, C, W), jnp.float32),
            pltpu.SemaphoreType.DMA((K * R, 2)),
        ],
    )
    kern = functools.partial(kern, K=K)
    call = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CA, T, CO), jnp.float32),
        interpret=interpret)
    outs = []
    for c in range(nchunk):
        sl = slice(c * CA, (c + 1) * CA)
        args = (tcount[sl], wstart[sl].reshape(-1),
                wcount[sl].reshape(-1), viscov, tgt[sl], sf)
        if c == 0 or interpret:
            outs.append(call(*args))
        else:
            outs.append(jax.lax.cond(
                rd.nactive > c * CA,
                lambda a=args: call(*a),
                lambda: jnp.zeros((CA, T, CO), jnp.float32)))
    out = jnp.concatenate(outs, axis=0)[:A] if nchunk > 1 else outs[0][:A]
    return out.reshape(A * T, CO)


def interaction_forces_nn_rows(csp: CteSph, opts: SolverOpts,
                               phases: "NN.PhaseCfg", dom, rd: "cd.RowDiv",
                               pos, vel, rho, code, interpret=False):
    """Fused NN interaction over the row-padded layout: pallas PressGrad ->
    XLA strain/eta (+ tau) -> pallas viscous pass.  Same contract as
    forces_nn.interaction_forces_nn (returns (Forces, visco_eta, tau))."""
    NP = rd.ncap
    f32 = pos.dtype
    tb = phases.tables(csp)
    NPH = phases.count
    T, W = CF.tiles_rows(dom)

    act = td.is_active(code)
    ptype = td.code_type(code)
    fluidside = ptype >= td.TYPE_FLOATING
    kind = ptype.astype(jnp.float32)
    phase_idx = jnp.clip(td.code_value(code).astype(jnp.int32), 0, NPH - 1)
    px = jnp.where(act, pos[:, 0],
                   jnp.float32(dom.posmin[0] - 20.0 * dom.scell))
    rho_s = jnp.where(act, rho, 1.0)
    vel_s = jnp.where(act[:, None], vel, 0.0)
    # bound: SYSTEM EOS (ComputePress_NN, JSphCpu_Tensors.cpp:48-70)
    press_bound = csp.cteb * ((rho_s / csp.rhopzero) ** csp.gamma - 1.0)
    press = jnp.where(act & fluidside, NN.press_nn(tb, phase_idx, rho_s),
                      press_bound)
    press = jnp.where(act, press, 0.0)
    mass = jnp.where(fluidside, tb["mass"][phase_idx],
                     jnp.float32(csp.massbound))
    cbar = tb["cs0"][phase_idx]
    phasef = phase_idx.astype(jnp.float32)

    morris = opts.tvisco == TpVisco.LAMINAR_SPS
    conseq = opts.tvisco == TpVisco.CONST_EQ
    use_fda = (opts.velgrad == td.TpVelGrad.FDA and (morris or conseq))

    chans1 = [px, pos[:, 1], pos[:, 2], vel_s[:, 0], vel_s[:, 1],
              vel_s[:, 2], rho_s, press, 1.0 / rho_s, kind, mass, cbar,
              phasef]
    if use_fda:
        # single fused pass: pass-1 physics + per-pair strain/eta/viscous
        chans = chans1 + [tb["visco"][phase_idx], tb["tau_yield"][phase_idx],
                          tb["hbp_m"][phase_idx], tb["hbp_n"][phase_idx],
                          tb["tau_max"][phase_idx], tb["bi_multi"][phase_idx]]
        CO = 8 + (8 if opts.shiftmode.value != 0 else 0)
        kern = functools.partial(_kernel_fda, SA=CF.sa_chunks(dom, W),
                                 csp=csp, opts=opts,
                                 R=rd.wstart.shape[1], T=T, W=W, CW=CF.CW,
                                 CO=CO, C=CF1)
        canon = _call_rows(kern, rd, dom, chans, CF1, CO, interpret)
        ace = canon[:, 0:3]
        ar = canon[:, 3]
        if opts.tdensity != TpDensity.NONE:
            ar = ar + jnp.where(canon[:, 5] > 0, 0.0, canon[:, 4])
        viscdtmax = jnp.maximum(jnp.max(canon[:, 6]), 0.0)
        visco_eta = canon[:, 7]
        shiftposfs = shift_blocked = None
        if opts.shiftmode.value != 0:
            shiftposfs = canon[:, 8:12]
            shift_blocked = canon[:, 12] > 0
        if csp.simulate2d:
            ace = ace.at[:, 1].set(0.0)
        fr = Forces(ace=ace, ar=ar, viscdtmax=viscdtmax,
                    shiftposfs=shiftposfs, shift_blocked=shift_blocked,
                    spsgradvel=None, viscetadtmax=jnp.max(visco_eta))
        return fr, visco_eta, jnp.zeros((NP, 6), f32)

    CO1 = _co1(opts)
    kern1 = functools.partial(_kernel_nn1, SA=CF.sa_chunks(dom, W),
                              csp=csp, opts=opts,
                              R=rd.wstart.shape[1], T=T, W=W, CW=CF.CW,
                              CO=CO1, C=C1)
    canon1 = _call_rows(kern1, rd, dom, chans1, C1, CO1, interpret)

    ace = canon1[:, 0:3]
    ar = canon1[:, 3]
    if opts.tdensity != TpDensity.NONE:
        ar = ar + jnp.where(canon1[:, 5] > 0, 0.0, canon1[:, 4])
    viscdtmax = jnp.maximum(jnp.max(canon1[:, 6]), 0.0)
    gradvel = canon1[:, 7:13]
    shiftposfs = shift_blocked = None
    if opts.shiftmode.value != 0:
        shiftposfs = canon1[:, 13:17]
        shift_blocked = canon1[:, 17] > 0

    # pass 2: effective viscosity (elementwise)
    visco_eta = jnp.zeros((NP,), f32)
    tau_p = jnp.zeros((NP, 6), f32)
    if morris or conseq:
        D, dmagn = NN.strain_rate(gradvel)
        visco_eta = jnp.where(td.is_fluid(code) & act,
                              NN.eta_effective(tb, phase_idx, dmagn), 0.0)
        if conseq:
            tau_p = 2.0 * visco_eta[:, None] * D

    # pass 3: viscous forces
    if morris:
        chans3 = [px, pos[:, 1], pos[:, 2], vel_s[:, 0], vel_s[:, 1],
                  vel_s[:, 2], 1.0 / rho_s, kind, mass, visco_eta]
    elif conseq:
        chans3 = [px, pos[:, 1], pos[:, 2], 1.0 / rho_s, kind, mass] \
            + [tau_p[:, i] for i in range(6)]
    else:
        vnn = tb["visco"][phase_idx]
        chans3 = [px, pos[:, 1], pos[:, 2], vel_s[:, 0], vel_s[:, 1],
                  vel_s[:, 2], rho_s, kind, mass, cbar, vnn]
    kern3 = functools.partial(_kernel_nn3, SA=CF.sa_chunks(dom, W),
                              csp=csp, opts=opts,
                              R=rd.wstart.shape[1], T=T, W=W, CW=CF.CW,
                              CO=8, C=C3)
    canon3 = _call_rows(kern3, rd, dom, chans3, C3, 8, interpret)
    ace = ace + canon3[:, 0:3]
    if csp.simulate2d:
        ace = ace.at[:, 1].set(0.0)

    viscetadtmax = jnp.max(visco_eta)
    fr = Forces(ace=ace, ar=ar, viscdtmax=viscdtmax, shiftposfs=shiftposfs,
                shift_blocked=shift_blocked, spsgradvel=None,
                viscetadtmax=viscetadtmax)
    return fr, visco_eta, tau_p
