"""Equation of state (Tait / Monaghan 1994) as pure jnp functions.

Reference: `/root/reference/src/source/FunSphEos.h:38-64` —
``press = b*((rho/rho0)^gamma - 1)``.  Also provides the inverse (density from
pressure), used by case initialization for hydrostatic density profiles
(GenCase ``rhopgradient`` modes).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..typesdef import CteSph


def press_from_rho(csp: CteSph, rho):
    """Tait EOS pressure; reference `ComputePressMonaghan` (FunSphEos.h:38-40)."""
    return csp.cteb * ((rho / csp.rhopzero) ** csp.gamma - 1.0)


def rho_from_press(csp: CteSph, press):
    """Inverse Tait EOS (density from pressure)."""
    return csp.rhopzero * (press / csp.cteb + 1.0) ** (1.0 / csp.gamma)


def hydrostatic_rho(csp: CteSph, z, z_surface):
    """Initial hydrostatic density below a free surface at ``z_surface``
    (GenCase ``rhopgradient=2`` water-column mode): solves
    p = rho0*g*(z_surf - z) through the inverse EOS."""
    g = abs(csp.gravity[2])
    press = csp.rhopzero * g * jnp.maximum(z_surface - z, 0.0)
    return rho_from_press(csp, press)
