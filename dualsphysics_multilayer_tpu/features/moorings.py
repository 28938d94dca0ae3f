"""Force points and mooring lines for floating bodies.

TPU-native replacement for the reference's closed-lib couplings
(`JDsFtForcePoints` — external point forces summed into the rigid solve,
`JSphCpuSingle.cpp:903-913, 1009-1015`; `JDsMooredFloatings` + MoorDyn+
`libdsphmoordyn`, SURVEY §2.12): body-attached fairlead points receive line
tensions that enter the 6-DOF solve as extra force + torque, evaluated
inside the jitted step (no host round trip).

The line model is a quasi-static elastic catenary approximation in the
spirit of lumped-mass MoorDyn's static limit:

* taut line (length > unstretched L0): axial tension
  T = k (l - L0) / L0 + c d(l)/dt  along the line, k = EA stiffness,
* slack line: zero tension (optionally a small net-weight pull),
* seabed/weight sag is not modeled (a later refinement can swap in the
  analytic catenary without touching the coupling).

`MooringCfg.forces(ftstate)` returns (ext_face, ext_fomegaace) shaped (B,3),
the exact quantities `features.floating.run_floating` accepts — mirroring
how the reference folds ForcePoints into FtoForces before FtCalcForces.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MooringLine:
    """One line: world anchor -> body-fixed fairlead on body ``body``."""
    body: int
    anchor: tuple          # world coordinates
    fairlead: tuple        # body-frame offset from the body center (at t=0)
    length0: float         # unstretched length
    stiffness: float       # EA/L0-style axial stiffness (N per unit strain)
    damping: float = 0.0   # axial damping (N s/m)


@dataclass(frozen=True)
class MooringCfg:
    lines: tuple           # (MooringLine, ...)
    nbodies: int

    def forces(self, fts, f32=jnp.float32):
        """Line tensions -> per-body (force, torque) sums.  ``fts`` is the
        FloatingState (center/fvel/fomega/angles)."""
        from .floating import _euler_rot
        B = self.nbodies
        face = jnp.zeros((B, 3), f32)
        fom = jnp.zeros((B, 3), f32)
        R = _euler_rot(fts.angles)                    # (B,3,3)
        for ln in self.lines:
            b = ln.body
            r_local = jnp.asarray(ln.fairlead, f32)
            r_world = R[b] @ r_local                  # rotated arm
            p_fair = fts.center[b] + r_world
            v_fair = fts.fvel[b] + jnp.cross(fts.fomega[b], r_world)
            d = jnp.asarray(ln.anchor, f32) - p_fair  # fairlead -> anchor
            l = jnp.sqrt(jnp.sum(d * d) + 1e-12)
            u = d / l
            strain = (l - ln.length0) / ln.length0
            lrate = -jnp.sum(v_fair * u)              # d(l)/dt
            tension = jnp.maximum(
                ln.stiffness * strain + ln.damping * lrate, 0.0)
            taut = (strain > 0.0).astype(f32)
            f = taut * tension * u
            face = face.at[b].add(f)
            fom = fom.at[b].add(jnp.cross(r_world, f))
        return face, fom


@dataclass(frozen=True)
class ForcePoint:
    """External time-varying point force on a body (`JDsFtForcePoints`):
    force(t) linearly interpolated from a table, applied at a body-fixed
    point."""
    body: int
    point: tuple           # body-frame offset from the center
    times: tuple = (0.0,)
    forces: tuple = (0.0, 0.0, 0.0)   # (nt*3,) row-major

    def force_at(self, t, f32=jnp.float32):
        times = jnp.asarray(self.times, f32)
        vals = jnp.asarray(self.forces, f32).reshape(len(self.times), 3)
        if len(self.times) == 1:
            return vals[0]
        t = jnp.clip(t, times[0], times[-1])
        i = jnp.clip(jnp.searchsorted(times, t, side="right") - 1,
                     0, len(self.times) - 2)
        f = (t - times[i]) / jnp.maximum(times[i + 1] - times[i], 1e-12)
        return vals[i] * (1 - f) + vals[i + 1] * f


@dataclass(frozen=True)
class ForcePointsCfg:
    points: tuple
    nbodies: int

    def forces(self, fts, tabs, f32=jnp.float32):
        from .floating import _euler_rot
        B = self.nbodies
        face = jnp.zeros((B, 3), f32)
        fom = jnp.zeros((B, 3), f32)
        R = _euler_rot(fts.angles)
        for fp in self.points:
            b = fp.body
            r_world = R[b] @ jnp.asarray(fp.point, f32)
            f = fp.force_at(tabs, f32)
            face = face.at[b].add(f)
            fom = fom.at[b].add(jnp.cross(r_world, f))
        return face, fom
