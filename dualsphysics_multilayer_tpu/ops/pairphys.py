"""Per-pair WCSPH physics, shared by every interaction layout.

This is the single source of truth for the pair terms of the reference's
interaction loops (`/root/reference/src/source/JSphCpu.cpp:548-822`,
GPU twin `JSphGpu_ker.cu:512-748`): momentum (pressure + tensile), continuity,
delta-SPH density diffusion (Molteni / Fourtakas), artificial and
laminar+SPS viscosity, and shifting accumulators.

Callers lay pairs out however their neighbour structure dictates — cell-bucket
tiles (A,K,K), Verlet neighbour lists (N,M), or Pallas VMEM tiles — build the
broadcasted per-pair inputs, call :func:`pair_terms`, and reduce over their
candidate axis.  Keeping the physics layout-agnostic is the TPU analog of the
reference's single templated pair body reused by CPU and GPU.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
import jax.numpy as jnp

from .. import typesdef as td
from ..typesdef import CteSph, TpBoundary, TpDensity, TpKernel, TpShifting, TpVisco
from . import kernels as K


@dataclass
class PairInputs:
    """Broadcasted per-pair fields.  Index 1 = target, 2 = candidate.
    All arrays share one pair shape (...,); vectors are (...,3)."""
    dr: jax.Array          # r1 - r2
    rr2: jax.Array
    pair: jax.Array        # bool: pair participates at all
    dv: jax.Array          # v1 - v2
    mass2: jax.Array
    rho1: jax.Array
    rho2: jax.Array
    press1: jax.Array
    press2: jax.Array
    bound_t: jax.Array     # bool: target is boundary (fixed/moving)
    bound_c: jax.Array     # bool: candidate is boundary
    ft_t: jax.Array        # bool: target is floating
    ft_c: jax.Array        # bool: candidate is floating
    fixed_c: jax.Array     # bool: candidate is fixed boundary
    tau_t: jax.Array | None = None   # (...,6) target SPS stress (zero for non-fluid)
    tau_c: jax.Array | None = None   # (...,6) candidate SPS stress (zero for non-fluid)


@dataclass
class PairTerms:
    """Per-pair contributions; reduce over your candidate axis.
    Boolean flags are per-pair 'poison' markers to be any-reduced."""
    ace: jax.Array
    ar: jax.Array
    delta: jax.Array | None
    delta_blocked: jax.Array | None
    shift: jax.Array | None          # (...,4)
    shift_blocked: jax.Array | None
    gradvel: jax.Array | None        # (...,6)
    visc: jax.Array                  # per-pair dot_rr2 (masked to -inf outside)


_NEG = np.float32(-3.4e38)   # plain numpy: no backend init at import time


def pair_terms(csp: CteSph, opts, p: PairInputs, ddtkh,
               visco=None) -> PairTerms:
    """``visco``: traced viscosity scalar for the JDsViscoInput channel
    (time-varying ``<parameters> ViscoTime`` CSV, `JSphCpuSingle.cpp:1092`);
    defaults to the static ``csp.visco``."""
    f32 = p.dr.dtype
    cbar = jnp.asarray(csp.cs0, f32)
    eta2 = jnp.asarray(csp.eta2, f32)
    if visco is None:
        visco = jnp.asarray(csp.visco, f32)
    ks2 = jnp.asarray(csp.kernelsize2, f32)

    pw = p.pair.astype(f32)
    rr2s = jnp.where(p.pair, p.rr2, ks2)
    fac = K.kernel_fac(csp, rr2s)
    fr = fac[..., None] * p.dr

    dvfr = jnp.sum(p.dv * fr, axis=-1)
    drfr = jnp.sum(p.dr * fr, axis=-1)
    dot = jnp.sum(p.dr * p.dv, axis=-1)
    dot_rr2 = dot / (rr2s + eta2)

    bb = p.bound_t & p.bound_c
    w_comp = pw * (1.0 - bb.astype(f32))        # bound-bound pairs never interact
    w_mom = pw * (1.0 - p.bound_t.astype(f32))  # momentum: fluid-side targets only

    # momentum (JSphCpu.cpp:713-716)
    prs = (p.press1 + p.press2) / (p.rho1 * p.rho2)
    if csp.tkernel == TpKernel.CUBIC:
        prs = prs + K.cubic_tensil(csp, rr2s, p.rho1, p.press1, p.rho2, p.press2)
    ace = -(w_mom * prs * p.mass2)[..., None] * fr

    # continuity (JSphCpu.cpp:720, bound form :601)
    ar = w_comp * p.mass2 * dvfr * (p.rho1 / p.rho2)

    # density diffusion term
    delta = delta_blocked = None
    if opts.tdensity != TpDensity.NONE:
        w_ddt = w_mom * (1.0 - p.ft_t.astype(f32))
        if opts.tdensity == TpDensity.MOLTENI:
            # Molteni & Colagrossi 2009 (JSphCpu.cpp:724-731)
            visc_densi = ddtkh * cbar * (p.rho1 / p.rho2 - 1.0) / (rr2s + eta2)
            delta = w_ddt * visc_densi * drfr * p.mass2
            blocked = p.pair & (~p.bound_t) & ~p.ft_t
            if opts.tboundary == TpBoundary.DBC:
                blocked_b = blocked & p.bound_c
            else:
                blocked_b = jnp.zeros_like(p.bound_c)
            delta_blocked = blocked_b | (blocked & p.ft_c)
        else:
            # Fourtakas et al. 2019 (JSphCpu.cpp:733-740); FULL also applies
            # to bound pairs without the poison
            applies = (jnp.ones_like(p.bound_c)
                       if opts.tdensity == TpDensity.FOURTAKAS else ~p.bound_c)
            rh = 1.0 + csp.ddtgz * p.dr[..., 2]
            drhop = csp.rhopzero * rh ** (1.0 / csp.gamma) - csp.rhopzero
            visc_densi = ddtkh * cbar * ((p.rho2 - p.rho1) - drhop) / (rr2s + eta2)
            w2 = w_ddt * (applies & ~p.ft_c & ~p.bound_c).astype(f32)
            delta = -w2 * visc_densi * drfr * p.mass2 / p.rho2
            delta_blocked = (p.pair & (~p.bound_t) & ~p.ft_t & p.bound_c
                             & applies)

    # shifting accumulators (JSphCpu.cpp:743-750)
    shift = shift_blocked = None
    if opts.shiftmode != TpShifting.NONE:
        massrhop = w_mom * p.mass2 / p.rho2
        shift = jnp.stack([massrhop * fr[..., 0], massrhop * fr[..., 1],
                           massrhop * fr[..., 2], -massrhop * drfr], axis=-1)
        if opts.shiftmode == TpShifting.NO_BOUND:
            shift_blocked = p.pair & (~p.bound_t) & (p.bound_c | p.ft_c)
        elif opts.shiftmode == TpShifting.NO_FIXED:
            shift_blocked = p.pair & (~p.bound_t) & p.fixed_c
        else:
            shift_blocked = jnp.zeros_like(p.pair)

    # viscosity (JSphCpu.cpp:757-791)
    visc = jnp.where(w_comp > 0, dot_rr2, _NEG)
    visco_eff = jnp.where(p.bound_c, visco * jnp.float32(csp.viscoboundfactor),
                          visco)
    gradvel = None
    if opts.tvisco == TpVisco.ARTIFICIAL:
        amubar = csp.kernelh * dot_rr2
        robar = (p.rho1 + p.rho2) * 0.5
        pi_visc = jnp.where((dot < 0) & (w_mom > 0),
                            (-visco_eff * cbar * amubar / robar) * p.mass2, 0.0)
        ace = ace - pi_visc[..., None] * fr
    elif opts.tvisco == TpVisco.LAMINAR_SPS:
        robar2 = p.rho1 + p.rho2
        temp = 4.0 * visco_eff / ((rr2s + eta2) * robar2)
        vtemp = w_mom * p.mass2 * temp * drfr
        ace = ace + vtemp[..., None] * p.dv
        tau_sum = (p.tau_t
                   + jnp.where((~p.bound_c & ~p.ft_c)[..., None], p.tau_c, 0.0))
        txx, txy, txz, tyy, tyz, tzz = [tau_sum[..., i] for i in range(6)]
        m2w = w_mom * p.mass2
        ace = ace + jnp.stack([
            m2w * (txx * fr[..., 0] + txy * fr[..., 1] + txz * fr[..., 2]),
            m2w * (txy * fr[..., 0] + tyy * fr[..., 1] + tyz * fr[..., 2]),
            m2w * (txz * fr[..., 0] + tyz * fr[..., 1] + tzz * fr[..., 2]),
        ], axis=-1)
        volp2 = -(w_mom * (1.0 - p.ft_t.astype(f32))) * p.mass2 / p.rho2
        dvx, dvy, dvz = p.dv[..., 0] * volp2, p.dv[..., 1] * volp2, p.dv[..., 2] * volp2
        gradvel = jnp.stack([
            dvx * fr[..., 0], dvx * fr[..., 1] + dvy * fr[..., 0],
            dvx * fr[..., 2] + dvz * fr[..., 0], dvy * fr[..., 1],
            dvy * fr[..., 2] + dvz * fr[..., 1], dvz * fr[..., 2],
        ], axis=-1)

    return PairTerms(ace=ace, ar=ar, delta=delta, delta_blocked=delta_blocked,
                     shift=shift, shift_blocked=shift_blocked, gradvel=gradvel,
                     visc=visc)


def particle_flags(csp: CteSph, code, ftomassp=None, with_floating=False):
    """Per-particle masks + mass derived from typecodes (one place, reused by
    every layout)."""
    ptype = td.code_type(code)
    fluidside = ptype >= td.TYPE_FLOATING
    floating = ptype == td.TYPE_FLOATING
    fixed = ptype == td.TYPE_FIXED
    if with_floating and ftomassp is not None:
        mass = jnp.where(floating,
                         jnp.take(ftomassp, td.code_value(code), mode="clip"),
                         jnp.where(fluidside, csp.massfluid, csp.massbound)
                         .astype(jnp.float32))
    else:
        mass = jnp.where(fluidside, csp.massfluid, csp.massbound).astype(jnp.float32)
    return fluidside, floating, fixed, mass
