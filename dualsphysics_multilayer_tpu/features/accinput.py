"""Time-varying external acceleration per fluid mk block.

TPU re-design of `JDsAccInput` (`JDsAccInput.h/cpp`, GPU `JDsAccInput_ker.cu`,
`StAceInput` `DualSphDef.h:286-295`): each input drives one fluid mk with a
linear + angular acceleration time series (from CSV in the reference; here a
sampled table with linear interpolation), optionally replacing gravity.
Applied during pre-interaction (`JSphCpu::PreInteractionVars_Forces`,
JSphCpu.cpp:445) so it enters AceMax and the dt control like any other force.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .. import typesdef as td


@dataclass(frozen=True)
class AccInput:
    mkfluid: int
    times: tuple                 # (k,)
    acclin: tuple                # (k*3,) linear acceleration samples
    accang: tuple = ()           # (k*3,) angular acceleration (deg/s^2) or ()
    centre: tuple = (0.0, 0.0, 0.0)
    gravity_enabled: bool = True   # False => this input replaces gravity

    def at(self, t):
        times = jnp.asarray(self.times, jnp.float32)
        k = len(self.times)
        lin = jnp.asarray(self.acclin, jnp.float32).reshape(k, 3)
        tt = jnp.clip(t, times[0], times[-1])
        i = jnp.clip(jnp.searchsorted(times, tt, side="right") - 1, 0, k - 2)
        w = (tt - times[i]) / jnp.maximum(times[i + 1] - times[i], 1e-12)
        alin = lin[i] + (lin[i + 1] - lin[i]) * w
        if self.accang:
            ang = jnp.asarray(self.accang, jnp.float32).reshape(k, 3)
            aang = ang[i] + (ang[i + 1] - ang[i]) * w
        else:
            aang = jnp.zeros(3, jnp.float32)
        return alin, aang


def apply_accinput(inputs, csp, t, pos, vel, code, ace):
    """Add external accelerations to ``ace`` (the interaction accumulator,
    pre-gravity).  Mirrors `JDsAccInput::RunCpu`: alin (+ optional -gravity
    when the input replaces it) + angular terms a = aang x r + centripetal
    + Coriolis."""
    if not inputs:
        return ace
    fluid = td.is_fluid(code) & td.is_active(code)
    mkv = td.code_value(code)
    grav = jnp.asarray(csp.gravity, jnp.float32)
    for inp in inputs:
        sel = fluid & (mkv == inp.mkfluid)
        alin, aang = inp.at(t)
        add = jnp.broadcast_to(alin, ace.shape)
        if not inp.gravity_enabled:
            add = add - grav
        if inp.accang:
            r = pos - jnp.asarray(inp.centre, jnp.float32)
            d2r = jnp.float32(3.141592653589793 / 180.0)
            add = add + jnp.cross(jnp.broadcast_to(aang * d2r, r.shape), r)
        ace = jnp.where(sel[:, None], ace + add, ace)
    return ace
