"""Mooring line / force point tests (reference JDsMooredFloatings +
JDsFtForcePoints, SURVEY §2.12)."""

import jax.numpy as jnp
import numpy as np

from dualsphysics_multilayer_tpu.features.floating import FloatingState
from dualsphysics_multilayer_tpu.features.featureset import Features
from dualsphysics_multilayer_tpu.features.moorings import (
    ForcePoint, ForcePointsCfg, MooringCfg, MooringLine)
from dualsphysics_multilayer_tpu.models import cases
from dualsphysics_multilayer_tpu.models.wcsph import Simulation
from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
from dualsphysics_multilayer_tpu.typesdef import TpDensity


def _fts(center, vel=(0, 0, 0), omega=(0, 0, 0), ang=(0, 0, 0)):
    return FloatingState(
        center=jnp.asarray([center], jnp.float32),
        fvel=jnp.asarray([vel], jnp.float32),
        fomega=jnp.asarray([omega], jnp.float32),
        angles=jnp.asarray([ang], jnp.float32))


def test_mooring_line_tension_and_torque():
    # anchor straight below a fairlead offset from the center: taut when
    # stretched, slack otherwise; torque = r x F
    line = MooringLine(body=0, anchor=(1.0, 0, 0), fairlead=(0.5, 0, 0),
                       length0=1.0, stiffness=100.0)
    cfg = MooringCfg(lines=(line,), nbodies=1)
    # fairlead at (0.5,0,0)+center(0,0,0); anchor at 1.0 -> l=0.5 < L0: slack
    face, fom = cfg.forces(_fts((0.0, 0.0, 0.0)))
    assert np.allclose(np.asarray(face), 0.0)
    # move the body away: center (-1,0,0) -> fairlead (-0.5) -> l=1.5, strain
    # 0.5 -> T = 50 N toward the anchor (+x)
    face, fom = cfg.forces(_fts((-1.0, 0.0, 0.0)))
    assert abs(float(face[0, 0]) - 50.0) < 1e-3
    assert abs(float(face[0, 1])) < 1e-6 and abs(float(face[0, 2])) < 1e-6
    # vertical offset fairlead gives a pitch torque
    line2 = MooringLine(body=0, anchor=(2.0, 0, 1.0), fairlead=(0.0, 0, 1.0),
                        length0=1.0, stiffness=100.0)
    cfg2 = MooringCfg(lines=(line2,), nbodies=1)
    face2, fom2 = cfg2.forces(_fts((0.0, 0.0, 0.0)))
    # force +x applied at arm +z -> torque about -y... cross((0,0,1),(f,0,0))
    # = (0*0-1*0, 1*f-0*0, 0) = (0, f, 0)
    assert float(face2[0, 0]) > 0
    assert abs(float(fom2[0, 1]) - float(face2[0, 0])) < 1e-4


def test_forcepoint_interpolation():
    fp = ForcePoint(body=0, point=(0, 0, 0), times=(0.0, 1.0),
                    forces=(0, 0, 0, 10.0, 0, 0))
    cfg = ForcePointsCfg(points=(fp,), nbodies=1)
    face, _ = cfg.forces(_fts((0, 0, 0)), 0.5)
    assert abs(float(face[0, 0]) - 5.0) < 1e-5


def test_moored_buoyant_box_is_held_down():
    """A half-density box held 90% submerged by a taut vertical mooring rises
    much less than the same unmoored box."""
    kw = dict(dp=0.03, tank=(1.2, 1.0), water=0.5, box=(0.2, 0.2),
              box_pos=(0.5, 0.32), box_rho=500.0)

    def run(moor):
        case = cases.floatingbox2d(**kw)
        c0 = np.asarray(case.state.ft.center)[0]
        feats = Features(floating=case.meta["ftcfg"], moorings=moor)
        opts = SolverOpts(tdensity=TpDensity.FOURTAKAS, with_floating=True)
        sim = Simulation(case.csp, opts, case.dom, case.state, feats=feats)
        sim.run(tmax=0.3, tout=0.3)
        return float(c0[2]), float(np.asarray(sim.state.ft.center)[0, 2])

    z0, z_free = run(None)
    # stiff short line from the tank floor to the box center
    moor = MooringCfg(lines=(MooringLine(
        body=0, anchor=(0.6, 0.0, 0.0), fairlead=(0.0, 0.0, 0.0),
        length0=0.42 + 0.005, stiffness=5e4, damping=200.0),), nbodies=1)
    _, z_moored = run(moor)
    assert z_free > z0 + 0.01           # unmoored box rises
    assert z_moored < z_free - 0.005    # mooring holds it down
    assert z_moored < 0.45              # never far above the line limit
