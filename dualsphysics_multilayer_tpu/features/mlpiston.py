"""Multi-layer pistons: depth-varying piston velocity from external data.

TPU re-design of the reference `JMLPistons` (header + closed lib; in-tree GPU
part `JMLPistonsGpu`, SURVEY §2.11; XML `<mlayerpistons>`): a moving-boundary
block whose horizontal velocity varies per LAYER (z band), driven by a
time-series table (typically written by SWASH or another wave model).  Each
moving particle of the block interpolates its layer velocity bilinearly in
(t, z) and advances with it — reproducing a depth-resolved incident wave at
the boundary.

v1 implements the 1-D piston (`<piston1d>`); the 2-D variant (per-y columns,
`<piston2d>`) adds a y lookup on the same machinery in a later round.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .. import typesdef as td


@dataclass(frozen=True)
class MLPiston1D:
    """Layered piston for one moving mk block."""
    mk: int
    times: tuple           # (nt,) sample times
    zlayers: tuple         # (nl,) layer center elevations (ascending)
    vels: tuple            # (nt*nl,) x-velocity samples, row-major (t, z)
    direction: tuple = (1.0, 0.0, 0.0)

    def velocity_at(self, t, z):
        """Bilinear (t, z) interpolation of the layer velocity table."""
        times = jnp.asarray(self.times, jnp.float32)
        zl = jnp.asarray(self.zlayers, jnp.float32)
        nt, nl = len(self.times), len(self.zlayers)
        v = jnp.asarray(self.vels, jnp.float32).reshape(nt, nl)
        t = jnp.clip(t, times[0], times[-1])
        it = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, nt - 2)
        ft = (t - times[it]) / jnp.maximum(times[it + 1] - times[it], 1e-12)
        z = jnp.clip(z, zl[0], zl[-1])
        iz = jnp.clip(jnp.searchsorted(zl, z, side="right") - 1, 0, nl - 2)
        fz = (z - zl[iz]) / jnp.maximum(zl[iz + 1] - zl[iz], 1e-12)
        v00 = v[it, iz]
        v01 = v[it, iz + 1]
        v10 = v[it + 1, iz]
        v11 = v[it + 1, iz + 1]
        return ((1 - ft) * ((1 - fz) * v00 + fz * v01)
                + ft * ((1 - fz) * v10 + fz * v11))


def apply_mlpistons(pistons, tabs, dt, pos, vel, code):
    """Advance multi-layer piston particles by their layer velocity
    (the analog of `JSphCpu::MovePiston1d`, JSphCpu.h piston hooks).
    Returns (pos, vel)."""
    if not pistons:
        return pos, vel
    moving = td.is_moving(code) & td.is_active(code)
    mkv = td.code_value(code)
    for p in pistons:
        sel = moving & (mkv == p.mk)
        vmag = p.velocity_at(tabs, pos[:, 2])
        d = jnp.asarray(p.direction, vel.dtype)
        pvel = vmag[:, None] * d[None, :]
        pos = jnp.where(sel[:, None], pos + pvel * dt, pos)
        vel = jnp.where(sel[:, None], pvel, vel)
    return pos, vel
