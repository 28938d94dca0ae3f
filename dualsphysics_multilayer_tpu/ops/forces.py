"""Fused WCSPH pairwise force interaction (the hot path).

TPU-native re-design of the reference's interaction loops:

* fluid/float targets — momentum + continuity + DDT + viscosity + shifting
  (`/root/reference/src/source/JSphCpu.cpp:631-822` ``InteractionForcesFluid``,
  GPU twin `JSphGpu_ker.cu:512-748`),
* bound targets — DBC boundary density evolution + viscdt
  (`JSphCpu.cpp:548-625` ``InteractionForcesBound``).

Design departures for TPU (see SURVEY §7): the reference runs *two* passes per
target set (fluid-neighbour cells, bound-neighbour cells) and a separate bound
pass; here ONE fused gather pass over the cell-bucket structure computes every
accumulator for every target, with per-pair boolean masks selecting the terms
that apply (bound-bound pairs contribute nothing).  The reference's
compile-time template pyramid over <kernel, ftmode, visco, ddt, shift>
(`JSphCpu.cpp:966-1015`) becomes trace-time Python branching on ``SolverOpts``:
each configuration jit-specializes its own fused XLA kernel.

All accumulators are gather-only (one bucket slot per target); no scatter
races exist, matching the reference's one-thread-per-target pattern.
Acceleration excludes gravity (added by the integrator), as in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import typesdef as td
from ..typesdef import CteSph, TpBoundary, TpDensity, TpKernel, TpShifting, TpVisco
from . import celldiv as cd
from . import kernels as K

FLT_MAX = jnp.float32(3.4e38)


@dataclass(frozen=True)
class SolverOpts:
    """Trace-time solver configuration (the template parameters of
    `JSphCpu.h:216-241` plus feature toggles)."""
    tstep: "td.TpStep" = td.TpStep.SYMPLECTIC
    tvisco: TpVisco = TpVisco.ARTIFICIAL
    tdensity: TpDensity = TpDensity.FOURTAKAS
    tboundary: TpBoundary = TpBoundary.DBC
    slipmode: "td.TpSlipMode" = td.TpSlipMode.NO_SLIP
    shiftmode: TpShifting = TpShifting.NONE
    with_floating: bool = False
    verlet_steps: int = 40
    mdbc_threshold: float = 0.0


@jax.tree_util.register_dataclass
@dataclass
class Forces:
    """Canonical-order force accumulators for one interaction."""
    ace: jax.Array                 # (n,3) acceleration w/o gravity
    ar: jax.Array                  # (n,)  drho/dt (delta-SPH already folded in)
    viscdtmax: jax.Array           # ()    max dot(dv,dr)/(rr2+eta2) over pairs
    shiftposfs: jax.Array | None   # (n,4) shifting accum (grad-concentration xyz, -div r)
    shift_blocked: jax.Array | None  # (n,) bool: shifting cancelled near bound/floating
    spsgradvel: jax.Array | None   # (n,6) velocity-gradient accum (SPS only)


def interaction_forces(csp: CteSph, opts: SolverOpts, div: cd.DivData,
                       pos, vel, rho, press, code,
                       spstau=None, ftomassp=None, ddtkh=None) -> Forces:
    """One fused interaction over the bucket structure.

    ``ddtkh`` is a traced scalar so the DDT ramp (`JSphCpuSingle.cpp`
    ``RunInitialDDTRamp``) works without recompilation; defaults to the
    constant ``csp.ddtkh``.
    """
    n = div.ncap
    A, Kcap = div.bucket_idx.shape[0] - 1, div.bucket_idx.shape[1]
    f32 = pos.dtype
    if ddtkh is None:
        ddtkh = jnp.asarray(csp.ddtkh, f32)

    # ---- one-time gathers into bucket layout (A+1, K, d) -------------------
    pos_b = cd.gather(pos, div.bucket_idx)
    vel_b = cd.gather(vel, div.bucket_idx)
    rho_b = cd.gather(rho, div.bucket_idx, fill=1.0)
    press_b = cd.gather(press, div.bucket_idx)
    code_b = cd.gather(code, div.bucket_idx,
                       fill=td.code_make(td.TYPE_FLUID, 0, td.SPECIAL_OUT_IGNORE))
    use_sps = opts.tvisco == TpVisco.LAMINAR_SPS
    tau_b = cd.gather(spstau, div.bucket_idx) if use_sps else None

    valid_b = div.bucket_idx < n
    ptype_b = td.code_type(code_b)
    fluidside_b = ptype_b >= td.TYPE_FLOATING    # fluid or floating
    floating_b = ptype_b == td.TYPE_FLOATING
    fixed_b = ptype_b == td.TYPE_FIXED
    if opts.with_floating and ftomassp is not None:
        mass_b = jnp.where(
            floating_b,
            jnp.take(ftomassp, td.code_value(code_b), mode="clip"),
            jnp.where(fluidside_b, csp.massfluid, csp.massbound).astype(f32))
    else:
        mass_b = jnp.where(fluidside_b, csp.massfluid, csp.massbound).astype(f32)

    # ---- target views (A, K, ...) ------------------------------------------
    t = slice(0, A)
    pos_t, vel_t, rho_t = pos_b[t], vel_b[t], rho_b[t]
    press_t, valid_t = press_b[t], valid_b[t]
    fluidside_t, floating_t = fluidside_b[t], floating_b[t]

    cbar = jnp.asarray(csp.cs0, f32)
    ks2 = jnp.asarray(csp.kernelsize2, f32)
    eta2 = jnp.asarray(csp.eta2, f32)

    zK = jnp.zeros((A, Kcap), f32)
    acc = dict(
        ace=jnp.zeros((A, Kcap, 3), f32), ar=zK, visc=zK, delta=zK,
        delta_blocked=jnp.zeros((A, Kcap), bool),
        shift=jnp.zeros((A, Kcap, 4), f32),
        shift_blocked=jnp.zeros((A, Kcap), bool),
        gradvel=jnp.zeros((A, Kcap, 6), f32) if use_sps else None,
    )

    # ---- loop over neighbour cells (static unroll, 27 in 3D / 9 in 2D) -----
    # The reference iterates z/y rows of contiguous x-ranges
    # (JCellSearch_inline.h:33-92); here each neighbour cell is one fixed
    # (K x K) pair tile gathered through the active-slot table.
    offsets = range(div.neigh_slot.shape[1])
    for o in offsets:
        cslot = div.neigh_slot[:, o]                     # (A,)
        pos_c = pos_b[cslot]                             # (A, K, 3)
        vel_c, rho_c = vel_b[cslot], rho_b[cslot]
        press_c, valid_c = press_b[cslot], valid_b[cslot]
        fluidside_c, floating_c = fluidside_b[cslot], floating_b[cslot]
        fixed_c, mass_c = fixed_b[cslot], mass_b[cslot]

        dr = pos_t[:, :, None, :] - pos_c[:, None, :, :]          # (A,K,K,3)
        rr2 = jnp.sum(dr * dr, axis=-1)
        pair = (valid_t[:, :, None] & valid_c[:, None, :]
                & (rr2 <= ks2) & (rr2 >= td.ALMOSTZERO))
        pw = pair.astype(f32)
        rr2s = jnp.where(pair, rr2, ks2)                           # safe rr2
        fac = K.kernel_fac(csp, rr2s)
        fr = fac[..., None] * dr                                   # kernel gradient

        mass2 = mass_c[:, None, :]
        rho2 = rho_c[:, None, :]
        press2 = press_c[:, None, :]
        rho1 = rho_t[:, :, None]
        press1 = press_t[:, :, None]
        bound_c = ~fluidside_c[:, None, :]
        bound_t = ~fluidside_t[:, :, None]
        ft_c = floating_c[:, None, :]
        ft_t = floating_t[:, :, None]

        dv = vel_t[:, :, None, :] - vel_c[:, None, :, :]
        dvfr = jnp.sum(dv * fr, axis=-1)                           # dv . gradW
        drfr = jnp.sum(dr * fr, axis=-1)                           # dr . gradW
        dot = jnp.sum(dr * dv, axis=-1)
        dot_rr2 = dot / (rr2s + eta2)

        # pairs that "compute" (ref: fluid target w/ anything, bound target w/
        # fluid-side neighbour; bound-bound pairs never interact)
        w_comp = pw * (1.0 - (bound_t & bound_c).astype(f32))
        # momentum equation: only fluid-side targets
        w_mom = pw * (~bound_t).astype(f32)

        # -- momentum (pressure term), JSphCpu.cpp:713-716
        prs = (press1 + press2) / (rho1 * rho2)
        if csp.tkernel == TpKernel.CUBIC:
            prs = prs + K.cubic_tensil(csp, rr2s, rho1, press1, rho2, press2)
        acc["ace"] = acc["ace"] - jnp.sum((w_mom * prs * mass2)[..., None] * fr,
                                          axis=2)

        # -- continuity, JSphCpu.cpp:720 (bound targets use the same form,
        #    JSphCpu.cpp:601)
        acc["ar"] = acc["ar"] + jnp.sum(w_comp * mass2 * dvfr * (rho1 / rho2),
                                        axis=-1)

        # -- density diffusion term (fluid targets only; floating excluded)
        if opts.tdensity != TpDensity.NONE:
            w_ddt = w_mom * (1.0 - ft_t.astype(f32))
            if opts.tdensity == TpDensity.MOLTENI:
                # JSphCpu.cpp:724-731
                visc_densi = ddtkh * cbar * (rho1 / rho2 - 1.0) / (rr2s + eta2)
                dlt = visc_densi * drfr * mass2
                acc["delta"] = acc["delta"] + jnp.sum(w_ddt * dlt, axis=-1)
                blocked = pair & (~bound_t) & ~ft_t
                if opts.tboundary == TpBoundary.DBC:
                    blocked = blocked & bound_c
                else:
                    blocked = blocked & jnp.zeros_like(bound_c)
                blocked = blocked | (pair & (~bound_t) & ft_c)     # ftp2 -> FLT_MAX
                acc["delta_blocked"] = acc["delta_blocked"] | jnp.any(blocked, axis=-1)
            else:
                # Fourtakas et al. 2019, JSphCpu.cpp:733-740
                applies = (jnp.ones_like(bound_c) if opts.tdensity == TpDensity.FOURTAKAS
                           else ~bound_c)
                rh = 1.0 + csp.ddtgz * dr[..., 2]
                drhop = csp.rhopzero * rh ** (1.0 / csp.gamma) - csp.rhopzero
                visc_densi = ddtkh * cbar * ((rho2 - rho1) - drhop) / (rr2s + eta2)
                dlt = visc_densi * drfr * mass2 / rho2
                w2 = w_ddt * (applies & ~ft_c & ~bound_c).astype(f32)
                acc["delta"] = acc["delta"] - jnp.sum(w2 * dlt, axis=-1)
                blocked = pair & (~bound_t) & ~ft_t & bound_c & applies
                acc["delta_blocked"] = acc["delta_blocked"] | jnp.any(blocked, axis=-1)
            acc["delta_blocked"] = acc["delta_blocked"] | (floating_t & valid_t)

        # -- shifting accumulators, JSphCpu.cpp:743-750
        if opts.shiftmode != TpShifting.NONE:
            massrhop = w_mom * mass2 / rho2
            sx = massrhop * fr[..., 0]
            sy = massrhop * fr[..., 1]
            sz = massrhop * fr[..., 2]
            sw = -massrhop * drfr
            acc["shift"] = acc["shift"] + jnp.stack(
                [sx.sum(-1), sy.sum(-1), sz.sum(-1), sw.sum(-1)], axis=-1)
            if opts.shiftmode == TpShifting.NO_BOUND:
                bl = pair & (~bound_t) & (bound_c | ft_c)
            elif opts.shiftmode == TpShifting.NO_FIXED:
                bl = pair & (~bound_t) & fixed_c[:, None, :]
            else:
                bl = jnp.zeros_like(pair)
            acc["shift_blocked"] = (acc["shift_blocked"] | jnp.any(bl, axis=-1)
                                    | (floating_t & valid_t))

        # -- viscosity, JSphCpu.cpp:757-791
        acc["visc"] = jnp.maximum(acc["visc"], jnp.max(
            jnp.where(w_comp > 0, dot_rr2, -FLT_MAX), axis=-1))
        visco_eff = jnp.where(bound_c, csp.visco * csp.viscoboundfactor,
                              csp.visco).astype(f32)
        if opts.tvisco == TpVisco.ARTIFICIAL:
            amubar = csp.kernelh * dot_rr2
            robar = (rho1 + rho2) * 0.5
            pi_visc = jnp.where((dot < 0) & (w_mom > 0),
                                (-visco_eff * cbar * amubar / robar) * mass2, 0.0)
            acc["ace"] = acc["ace"] - jnp.sum(pi_visc[..., None] * fr, axis=2)
        elif use_sps:
            # laminar operator (Morris) + SPS sub-particle stress
            robar2 = rho1 + rho2
            temp = 4.0 * visco_eff / ((rr2s + eta2) * robar2)
            vtemp = w_mom * mass2 * temp * drfr
            acc["ace"] = acc["ace"] + jnp.sum(vtemp[..., None] * dv, axis=2)
            tau_c = tau_b[cslot]
            tau_t = jnp.where(fluidside_t[..., None], tau_b[t], 0.0)
            tau_sum = (tau_t[:, :, None, :]
                       + jnp.where((~bound_c & ~ft_c)[..., None],
                                   tau_c[:, None, :, :], 0.0))
            txx, txy, txz, tyy, tyz, tzz = [tau_sum[..., i] for i in range(6)]
            m2w = w_mom * mass2
            acc["ace"] = acc["ace"] + jnp.stack([
                (m2w * (txx * fr[..., 0] + txy * fr[..., 1] + txz * fr[..., 2])).sum(-1),
                (m2w * (txy * fr[..., 0] + tyy * fr[..., 1] + tyz * fr[..., 2])).sum(-1),
                (m2w * (txz * fr[..., 0] + tyz * fr[..., 1] + tzz * fr[..., 2])).sum(-1),
            ], axis=-1)
            # velocity gradients (fluid targets only), JSphCpu.cpp:781-791
            volp2 = -(w_mom * (1.0 - ft_t.astype(f32))) * mass2 / rho2
            dvx, dvy, dvz = dv[..., 0] * volp2, dv[..., 1] * volp2, dv[..., 2] * volp2
            acc["gradvel"] = acc["gradvel"] + jnp.stack([
                (dvx * fr[..., 0]).sum(-1),
                (dvx * fr[..., 1] + dvy * fr[..., 0]).sum(-1),
                (dvx * fr[..., 2] + dvz * fr[..., 0]).sum(-1),
                (dvy * fr[..., 1]).sum(-1),
                (dvy * fr[..., 2] + dvz * fr[..., 1]).sum(-1),
                (dvz * fr[..., 2]).sum(-1),
            ], axis=-1)

    # ---- fold delta-SPH into ar (JSphCpuSingle.cpp:552-559) ------------------
    ar_bucket = acc["ar"]
    if opts.tdensity != TpDensity.NONE:
        ar_bucket = ar_bucket + jnp.where(acc["delta_blocked"], 0.0, acc["delta"])

    # ---- scatter back to canonical order ------------------------------------
    tidx = div.bucket_idx[t]
    ace = cd.scatter_add(n, tidx, acc["ace"], width=3)
    if csp.simulate2d:
        ace = ace.at[:, 1].set(0.0)   # JSphCpuSingle.cpp:544-550
    ar = cd.scatter_add(n, tidx, ar_bucket)
    viscdtmax = jnp.max(jnp.where(valid_t, acc["visc"], -FLT_MAX))
    viscdtmax = jnp.maximum(viscdtmax, 0.0)

    shiftposfs = shift_blocked = None
    if opts.shiftmode != TpShifting.NONE:
        shiftposfs = cd.scatter_add(n, tidx, acc["shift"], width=4)
        shift_blocked = cd.scatter_add(
            n, tidx, acc["shift_blocked"].astype(jnp.int32)) > 0

    spsgradvel = (cd.scatter_add(n, tidx, acc["gradvel"], width=6)
                  if use_sps else None)

    return Forces(ace=ace, ar=ar, viscdtmax=viscdtmax, shiftposfs=shiftposfs,
                  shift_blocked=shift_blocked, spsgradvel=spsgradvel)


def compute_sps_tau(csp: CteSph, rho, gradvel):
    """SPS sub-particle-stress tensor from accumulated velocity gradients;
    reference `JSphCpu::ComputeSpsTau` (JSphCpu.cpp, Smagorinsky + Blin)."""
    gxx, gxy, gxz, gyy, gyz, gzz = [gradvel[:, i] for i in range(6)]
    pow1 = gxx * gxx + gyy * gyy + gzz * gzz
    prr = pow1 + pow1 + gxy * gxy + gxz * gxz + gyz * gyz
    visc_sps = csp.spssmag * jnp.sqrt(prr)
    div_u = gxx + gyy + gzz
    sps_k = (2.0 / 3.0) * visc_sps * div_u
    sps_blin = csp.spsblin * prr
    sumsps = -(sps_k + sps_blin)
    two = visc_sps + visc_sps
    one_rho = 1.0 / rho
    return jnp.stack([
        one_rho * (two * gxx + sumsps),
        one_rho * (visc_sps * gxy),
        one_rho * (visc_sps * gxz),
        one_rho * (two * gyy + sumsps),
        one_rho * (visc_sps * gyz),
        one_rho * (two * gzz + sumsps),
    ], axis=-1)


def apply_shifting(csp: CteSph, opts: SolverOpts, dt, vel, code,
                   shiftposfs, shift_blocked):
    """Turn shifting accumulators into displacements; reference
    `JSphShifting::RunCpu` (JSphShifting.cpp).  Returns (n,3) displacement."""
    vmag = jnp.sqrt(jnp.sum(vel * vel, axis=-1))
    umagn = dt * csp.shiftcoef * csp.kernelh * vmag
    if csp.shifttfs:
        coeftfs = (2.0 if csp.simulate2d else 3.0) - csp.shifttfs
        conc = shiftposfs[:, 3]
        umagn = jnp.where(conc < csp.shifttfs, 0.0,
                          umagn * (conc - csp.shifttfs) / coeftfs)
    maxdist = csp.dp * 0.1
    disp = jnp.clip(shiftposfs[:, :3] * umagn[:, None], -maxdist, maxdist)
    ok = td.is_fluid(code) & td.is_normal(code) & ~shift_blocked
    return jnp.where(ok[:, None], disp, 0.0)
