"""Relaxation zones: blend fluid velocity toward an analytic wave/current.

TPU re-design of the reference relaxation-zone machinery (`JRelaxZones.h` +
closed lib; in-tree GPU kernels `JRelaxZone_ker.cu` — uniform `:58`, regular
wave `KerSetFluidVel :145`, spectrum `:250`, external `:374`, SURVEY §2.11):
inside a zone box, each fluid particle's velocity is relaxed toward a target
field with a smooth weight that rises toward the generation edge,

    v <- (1-f(x)) * v_sph + f(x) * v_target,
    f(x) = (exp(x_hat^psi) - 1) / (e - 1) * fmax,   x_hat in [0, 1],

(the Jacobsen-style exponential blending the reference uses; ``x_hat`` = 1 at
the wavemaker-side edge).  Targets:

* ``RelaxZoneRegular`` — 1st-order (Airy) regular wave velocity field
  u = (H/2) w cosh(k(z-z0+d))/sinh(kd) cos(theta),
  w = (H/2) w sinh(k(z-z0+d))/sinh(kd) sin(theta), theta = k(x-x0) - w t + phi;
  (the reference's 2nd-order Stokes terms slot in as an additive correction).
* ``RelaxZoneUniform`` — constant target velocity in a box (current
  generation / beach absorption toward zero).

Applied after the corrector, the same hook the reference uses
(`JSphCpuSingle.cpp:715-718` runs damping/relax after ComputeSymplecticCorr).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from .. import typesdef as td
from ..typesdef import CteSph


def _fweight(xhat, psi, fmax):
    """Exponential relaxation weight over normalized coordinate [0,1]."""
    xhat = jnp.clip(xhat, 0.0, 1.0)
    return fmax * (jnp.exp(xhat ** psi) - 1.0) / (math.e - 1.0)


@dataclass(frozen=True)
class RelaxZoneUniform:
    """Blend toward a constant velocity inside a box (reference
    `KerSetFluidVelUniform`, JRelaxZone_ker.cu:58)."""
    pmin: tuple
    pmax: tuple
    vel: tuple
    psi: float = 1.0          # weight exponent
    fmax: float = 1.0         # max blend fraction per step pass
    axis: int = 0             # blend coordinate axis
    invert: bool = False      # weight rises toward pmin instead of pmax

    def target_and_weight(self, csp, pos, tabs):
        inside = jnp.ones(pos.shape[0], bool)
        for ax in range(3):
            if csp.simulate2d and ax == 1:
                continue
            inside &= (pos[:, ax] >= self.pmin[ax]) & (pos[:, ax] <= self.pmax[ax])
        span = max(self.pmax[self.axis] - self.pmin[self.axis], 1e-12)
        xhat = (pos[:, self.axis] - self.pmin[self.axis]) / span
        if self.invert:
            xhat = 1.0 - xhat
        f = jnp.where(inside, _fweight(xhat, self.psi, self.fmax), 0.0)
        tgt = jnp.broadcast_to(jnp.asarray(self.vel, pos.dtype), pos.shape)
        return tgt, f


@dataclass(frozen=True)
class RelaxZoneRegular:
    """Blend toward a 1st-order regular wave (reference `KerSetFluidVel`,
    JRelaxZone_ker.cu:145; XML `<rzwaveregular>`)."""
    center: tuple             # zone center on the SWL (x0, y0, z_swl)
    width: float              # zone extent along the propagation direction
    height: float             # wave height H
    period: float             # wave period T
    depth: float              # water depth d
    phase: float = 0.0
    direction: tuple = (1.0, 0.0, 0.0)   # propagation (x only in v1)
    psi: float = 1.0
    fmax: float = 1.0
    g: float = 9.81

    def target_and_weight(self, csp, pos, tabs):
        from .wavegen import dispersion_k
        k = dispersion_k(self.period, self.depth, self.g)
        w = 2.0 * math.pi / self.period
        x0 = self.center[0]
        zswl = self.center[2]
        half = 0.5 * self.width
        x = pos[:, 0]
        z = jnp.clip(pos[:, 2] - zswl, -self.depth, 0.0)
        inside = (jnp.abs(x - x0) <= half) & (pos[:, 2] <= zswl + 0.6 * self.height)
        theta = k * (x - x0) - w * tabs + self.phase
        amp = 0.5 * self.height * w
        sinh_kd = math.sinh(k * self.depth)
        u = amp * jnp.cosh(k * (z + self.depth)) / sinh_kd * jnp.cos(theta)
        wv = amp * jnp.sinh(k * (z + self.depth)) / sinh_kd * jnp.sin(theta)
        tgt = jnp.stack([u, jnp.zeros_like(u), wv], axis=-1)
        # weight rises toward the up-wave edge of the zone (x0 - half)
        xhat = (x0 + half - x) / self.width
        f = jnp.where(inside, _fweight(xhat, self.psi, self.fmax), 0.0)
        return tgt, f


def apply_relaxzones(zones, csp: CteSph, tabs, pos, vel, code):
    """Blend all zones into the fluid velocity (post-corrector hook)."""
    fluid = td.is_fluid(code) & td.is_normal(code)
    for zn in zones:
        tgt, f = zn.target_and_weight(csp, pos, tabs)
        f = jnp.where(fluid, f, 0.0)[:, None]
        vel = vel * (1.0 - f) + tgt.astype(vel.dtype) * f
    return vel
