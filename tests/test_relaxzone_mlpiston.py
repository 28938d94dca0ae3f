"""Relaxation-zone and multi-layer-piston unit tests (SURVEY §2.11;
reference JRelaxZone_ker.cu / JMLPistons)."""

import math

import jax.numpy as jnp
import numpy as np

import dualsphysics_multilayer_tpu.typesdef as td
from dualsphysics_multilayer_tpu.features.mlpiston import (MLPiston1D,
                                                           apply_mlpistons)
from dualsphysics_multilayer_tpu.features.relaxzone import (
    RelaxZoneRegular, RelaxZoneUniform, apply_relaxzones)
from dualsphysics_multilayer_tpu.features.wavegen import dispersion_k
from dualsphysics_multilayer_tpu.typesdef import make_ctesph


def _csp():
    return make_ctesph(simulate2d=True, dp=0.1, speedsound=10.0)


def test_relaxzone_uniform_blend():
    csp = _csp()
    zone = RelaxZoneUniform(pmin=(0, -1, 0), pmax=(1, 1, 1), vel=(2.0, 0, 0),
                            psi=1.0, fmax=1.0)
    pos = jnp.asarray([[0.999, 0, 0.5],    # at the far edge: full blend
                       [0.5, 0, 0.5],      # middle: partial
                       [1.5, 0, 0.5]],     # outside: untouched
                      jnp.float32)
    vel = jnp.zeros((3, 3), jnp.float32)
    code = jnp.full((3,), td.code_make(td.TYPE_FLUID, 0), jnp.uint32)
    out = np.asarray(apply_relaxzones((zone,), csp, 0.0, pos, vel, code))
    assert abs(out[0, 0] - 2.0) < 0.01
    fmid = (math.e ** 0.5 - 1) / (math.e - 1)
    assert abs(out[1, 0] - 2.0 * fmid) < 1e-3
    assert out[2, 0] == 0.0
    # bound particles are never blended
    codeb = jnp.full((3,), td.code_make(td.TYPE_FIXED, 0), jnp.uint32)
    outb = np.asarray(apply_relaxzones((zone,), csp, 0.0, pos, vel, codeb))
    assert np.all(outb == 0.0)


def test_relaxzone_regular_airy_field():
    """Blended velocity at full weight equals the 1st-order wave solution."""
    csp = _csp()
    H, T, d = 0.1, 1.4, 0.35
    zone = RelaxZoneRegular(center=(1.0, 0, d), width=0.8, height=H, period=T,
                            depth=d, psi=1.0, fmax=1.0)
    k = dispersion_k(T, d)
    w = 2 * math.pi / T
    # a particle at the up-wave edge (full weight), at z = d/2, t = 0
    x = 1.0 - 0.4 + 1e-4
    z = d / 2
    pos = jnp.asarray([[x, 0, z]], jnp.float32)
    vel = jnp.zeros((1, 3), jnp.float32)
    code = jnp.full((1,), td.code_make(td.TYPE_FLUID, 0), jnp.uint32)
    out = np.asarray(apply_relaxzones((zone,), csp, 0.0, pos, vel, code))[0]
    th = k * (x - 1.0)
    amp = 0.5 * H * w
    zz = z - d  # depth coordinate (z - swl)
    u_exp = amp * math.cosh(k * (zz + d)) / math.sinh(k * d) * math.cos(th)
    w_exp = amp * math.sinh(k * (zz + d)) / math.sinh(k * d) * math.sin(th)
    assert abs(out[0] - u_exp) < 5e-3 * abs(u_exp) + 1e-4, (out[0], u_exp)
    assert abs(out[2] - w_exp) < 5e-3 * abs(w_exp) + 1e-4, (out[2], w_exp)


def test_mlpiston_bilinear_and_apply():
    times = (0.0, 1.0)
    zl = (0.0, 1.0)
    # v(t,z): corners 0, 2 (z) / 4, 6 (t=1)
    vels = (0.0, 2.0, 4.0, 6.0)
    p = MLPiston1D(mk=7, times=times, zlayers=zl, vels=vels)
    assert abs(float(p.velocity_at(0.0, 0.0)) - 0.0) < 1e-6
    assert abs(float(p.velocity_at(0.0, 1.0)) - 2.0) < 1e-6
    assert abs(float(p.velocity_at(1.0, 0.0)) - 4.0) < 1e-6
    assert abs(float(p.velocity_at(0.5, 0.5)) - 3.0) < 1e-6
    # clamping outside the table
    assert abs(float(p.velocity_at(5.0, 2.0)) - 6.0) < 1e-6

    pos = jnp.asarray([[0.0, 0, 0.5], [0.0, 0, 0.5]], jnp.float32)
    vel = jnp.zeros((2, 3), jnp.float32)
    code = jnp.asarray([td.code_make(td.TYPE_MOVING, 7),
                        td.code_make(td.TYPE_FLUID, 0)], jnp.uint32)
    dt = 0.1
    pos2, vel2 = apply_mlpistons((p,), 0.5, dt, pos, vel, code)
    pos2, vel2 = np.asarray(pos2), np.asarray(vel2)
    assert abs(vel2[0, 0] - 3.0) < 1e-6        # moving particle driven
    assert abs(pos2[0, 0] - 0.3) < 1e-6        # advanced by v*dt
    assert vel2[1, 0] == 0.0 and pos2[1, 0] == 0.0   # fluid untouched


def test_mlpiston2d_y_interpolation():
    """piston2d: columns at several y positions, linear interp between
    neighbours (_FmtXML_MLPistons.xml veldata/posy)."""
    from dualsphysics_multilayer_tpu.features.mlpiston import MLPiston2D
    times = (0.0, 1.0)
    zl = (0.0, 1.0)
    c0 = MLPiston1D(mk=5, times=times, zlayers=zl, vels=(1.0,) * 4)
    c1 = MLPiston1D(mk=5, times=times, zlayers=zl, vels=(3.0,) * 4)
    p = MLPiston2D(mk=5, cols=(c0, c1), posy=(0.0, 2.0))
    y = jnp.asarray([0.0, 1.0, 2.0, 5.0], jnp.float32)
    z = jnp.full((4,), 0.5, jnp.float32)
    v = np.asarray(p.velocity_at(0.5, y, z))
    np.testing.assert_allclose(v, [1.0, 2.0, 3.0, 3.0], atol=1e-6)

    pos = jnp.asarray([[0.0, 1.0, 0.5]], jnp.float32)
    vel = jnp.zeros((1, 3), jnp.float32)
    code = jnp.asarray([td.code_make(td.TYPE_MOVING, 5)], jnp.uint32)
    _, vel2 = apply_mlpistons((p,), 0.5, 0.1, pos, vel, code)
    assert abs(float(vel2[0, 0]) - 2.0) < 1e-6


def test_mlpiston_csv_and_xml(tmp_path):
    """<special><mlayerpistons> piston1d + piston2d parse from case XML;
    layer bands derive from the piston particle z extent."""
    from dualsphysics_multilayer_tpu.io import xmlcase

    (tmp_path / "velx.csv").write_text(
        "time;v1;v2;v3\n0.0;0.1;0.2;0.3\n2.0;0.5;0.6;0.7\n")
    (tmp_path / "velx_y1.csv").write_text(
        "time v1 v2 v3\n0.0 1.0 1.0 1.0\n2.0 1.0 1.0 1.0\n")
    xml = """<?xml version="1.0"?>
<case>
 <casedef>
  <constantsdef>
   <gravity x="0" y="0" z="-9.81"/><rhop0 value="1000"/><hswl value="0" auto="true"/>
   <gamma value="7"/><speedsystem value="0" auto="true"/><coefsound value="20"/>
   <speedsound value="0" auto="true"/><coefh value="1.0"/><cflnumber value="0.2"/>
  </constantsdef>
  <mkconfig boundcount="240" fluidcount="10"/>
  <geometry>
   <definition dp="0.05"><pointmin x="-0.3" y="0" z="0"/><pointmax x="2" y="0" z="1"/></definition>
   <commands><mainlist>
    <setmkbound mk="10"/><drawbox><boxfill>solid</boxfill>
     <point x="-0.2" y="0" z="0"/><size x="0.1" y="0" z="0.6"/></drawbox>
    <setmkbound mk="0"/><drawbox><boxfill>bottom</boxfill>
     <point x="0" y="0" z="0"/><size x="2" y="0" z="0.8"/></drawbox>
    <setmkfluid mk="0"/><drawbox><boxfill>solid</boxfill>
     <point x="0.1" y="0" z="0.05"/><size x="1" y="0" z="0.3"/></drawbox>
   </mainlist></commands>
  </geometry>
 </casedef>
 <execution>
  <special>
   <mlayerpistons>
    <piston1d>
     <mkbound value="10"/>
     <filevelx value="velx.csv"/>
     <incz value="0.05"/>
     <timedataini value="0.5"/>
     <smooth value="1"/>
    </piston1d>
   </mlayerpistons>
  </special>
  <parameters>
   <parameter key="TimeMax" value="0.1"/><parameter key="TimeOut" value="0.05"/>
  </parameters>
 </execution>
</case>"""
    p = tmp_path / "mlp_Def.xml"
    p.write_text(xml)
    case, opts, run = xmlcase.load_case(str(p))
    feats = case.meta["features"]
    assert len(feats.mlpistons) == 1
    pist = feats.mlpistons[0]
    assert pist.mk == 10
    # timedataini shifts the series
    assert pist.times[0] == 0.5 and pist.times[-1] == 2.5
    # 3 layers over the piston z extent [0, 0.6] + incz 0.05
    assert len(pist.zlayers) == 3
    np.testing.assert_allclose(pist.zlayers, [0.15, 0.35, 0.55], atol=1e-6)
    # the piston block got retyped to moving
    code = np.asarray(case.state.code)
    mv = (np.asarray(td.code_type(code)) == td.TYPE_MOVING) \
        & (np.asarray(td.code_value(code)) == 10)
    assert mv.any()
