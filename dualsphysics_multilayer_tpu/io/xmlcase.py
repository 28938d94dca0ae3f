"""DualSPHysics case-definition XML loader.

Re-implements the case-configuration stack the reference spreads over
GenCase + `JXml`/`JCaseCtes`/`JCaseEParms` (SURVEY §2.15): parses the
`*_Def.xml` files shipped with the reference examples — `<constantsdef>`
(JCaseCtes), `<geometry>` drawbox commands (the GenCase subset our lattice
generator covers), `<parameters>` key/value execution config (JCaseEParms,
full key list visible in examples/main/01_DamBreak/CaseDambreak_Def.xml:66-99)
and `<simulationdomain>` 'default +- x%' expressions — directly into a
runnable Case.
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET

import numpy as np

from .. import typesdef as td
from ..typesdef import (CteSph, TpBoundary, TpDensity, TpKernel, TpShifting,
                        TpStep, TpVisco, make_ctesph)
from ..models import cases as C
from ..ops import celldiv as cd
from ..ops.forces import SolverOpts


def _fget(el, name, attr="value", default=None):
    node = el.find(name)
    if node is None:
        return default
    v = node.get(attr)
    return default if v is None else float(v)


def _params(root):
    out = {}
    for p in root.iter("parameter"):
        out[p.get("key")] = p.get("value")
    return out


def _sim_domain(root, pmin, pmax):
    """Apply `<simulationdomain>` posmin/posmax 'default +- x[%]' expressions
    (JSph::ConfigDomainResize, JSph.cpp:407)."""
    sd = root.find(".//simulationdomain")
    if sd is None:
        return pmin, pmax

    def apply(expr, base, size, sign):
        if expr is None or expr.strip() == "default":
            return base
        e = expr.replace("default", "").strip()
        if not e:
            return base
        if e.endswith("%"):
            return base + sign * float(e[:-1].lstrip("+- ")) / 100.0 * size * \
                (1 if "+" in e or not e.startswith("-") else -1)
        return base + float(e)

    size = pmax - pmin
    node = sd.find("posmin")
    if node is not None:
        for i, ax in enumerate("xyz"):
            pmin[i] = apply(node.get(ax), pmin[i], size[i], -1)
    node = sd.find("posmax")
    if node is not None:
        for i, ax in enumerate("xyz"):
            pmax[i] = apply(node.get(ax), pmax[i], size[i], +1)
    return pmin, pmax


def load_case(path, *, mdbc=False, capacity=None):
    """Parse a *_Def.xml into (Case, SolverOpts, runparams dict)."""
    tree = ET.parse(path)
    root = tree.getroot()
    cdef = root.find("casedef")
    ctes = cdef.find("constantsdef")
    geo = cdef.find("geometry")

    gravity = (float(ctes.find("gravity").get("x")),
               float(ctes.find("gravity").get("y")),
               float(ctes.find("gravity").get("z")))
    rhop0 = _fget(ctes, "rhop0", default=1000.0)
    gamma = _fget(ctes, "gamma", default=7.0)
    coefsound = _fget(ctes, "coefsound", default=20.0)
    speedsound = _fget(ctes, "speedsound", default=0.0) or 0.0
    coefh = _fget(ctes, "coefh", default=1.0)
    hdp = _fget(ctes, "_hdp", default=0.0) or 0.0
    hswl = _fget(ctes, "hswl", default=0.0) or 0.0
    cfl = _fget(ctes, "cflnumber", default=0.2)

    defn = geo.find("definition")
    dp = float(defn.get("dp"))
    ptmin = defn.find("pointmin")
    sim2d = ptmin is not None and ptmin.get("y") == ptmin.get("y") and \
        float(defn.find("pointmax").get("y")) == float(ptmin.get("y"))

    # ---- geometry commands (GenCase drawbox subset) -------------------------
    draw = C.Draw(dp=dp, simulate2d=sim2d)
    mode = dict(type=td.TYPE_FLUID, mk=0)
    zfluid_max = -1e30
    for cmd in geo.find("commands").find("mainlist"):
        tag = cmd.tag
        if tag == "setmkfluid":
            mode = dict(type=td.TYPE_FLUID, mk=int(cmd.get("mk", 0)))
        elif tag == "setmkbound":
            mode = dict(type=td.TYPE_FIXED, mk=int(cmd.get("mk", 0)))
        elif tag == "setmkvoid":
            mode = None
        elif tag == "drawbox" and mode is not None:
            fill = (cmd.find("boxfill").text or "solid").strip()
            pt = cmd.find("point")
            sz = cmd.find("size")
            p0 = np.array([float(pt.get(a)) for a in "xyz"])
            s = np.array([float(sz.get(a)) for a in "xyz"])
            faces = "solid" if "solid" in fill else fill.replace(" ", "")
            draw.box(tuple(p0), tuple(p0 + s), ptype=mode["type"],
                     mk=mode["mk"], faces=faces)
            if mode["type"] == td.TYPE_FLUID:
                zfluid_max = max(zfluid_max, p0[2] + s[2])
        # (void boxes and other shapes: later rounds)
    pos, code = draw.build()

    if not hswl:
        isfl = np.asarray(td.code_type(code) == td.TYPE_FLUID)
        hswl = float(pos[isfl, 2].max() - pos[isfl, 2].min()) + dp

    csp = make_ctesph(
        simulate2d=sim2d, dp=dp, rhopzero=rhop0, gamma=gamma, gravity=gravity,
        coefh=coefh, hdp=hdp, hswl=hswl, coefsound=coefsound,
        speedsound=speedsound, cflnumber=cfl)

    # ---- execution parameters ------------------------------------------------
    P = _params(root)

    def pf(key, default):
        return float(P.get(key, default))

    csp = csp.replace(
        visco=pf("Visco", 0.01),
        viscoboundfactor=pf("ViscoBoundFactor", 1.0),
        ddtvalue=pf("DensityDTvalue", 0.1),
        ddtkh=csp.kernelsize * pf("DensityDTvalue", 0.1),
        shiftcoef=pf("ShiftCoef", -2.0),
        shifttfs=pf("ShiftTFS", 0.0),
        coefdtmin=pf("CoefDtMin", 0.05),
        dtini=pf("DtIni", 0.0) or csp.dtini,
        dtmin=pf("DtMin", 0.0) or csp.dtmin,
        dtfixed=pf("DtFixed", 0.0),
        rhopoutmin=pf("RhopOutMin", 700.0),
        rhopoutmax=pf("RhopOutMax", 1300.0),
        tkernel=TpKernel(int(pf("Kernel", 2))),
    )
    tvisco = TpVisco(int(pf("ViscoTreatment", 1)))
    opts = SolverOpts(
        tstep=TpStep(int(pf("StepAlgorithm", 1))),
        verlet_steps=int(pf("VerletSteps", 40)),
        tvisco=tvisco,
        tdensity=TpDensity(int(pf("DensityDT", 0))),
        tboundary=TpBoundary.MDBC if mdbc else TpBoundary.DBC,
        shiftmode=TpShifting(int(pf("Shifting", 0))),
    )

    # ---- domain + state -------------------------------------------------------
    ks = csp.kernelsize
    pmin = pos.min(axis=0) - 2 * ks
    pmax = pos.max(axis=0) + 2 * ks
    pmin, pmax = _sim_domain(root, pmin, pmax)
    if sim2d:
        pmin[1], pmax[1] = pos[0, 1] - ks / 2, pos[0, 1] + ks / 2
    dom = cd.make_domain(tuple(pmin), tuple(pmax), ks, simulate2d=sim2d,
                         dp=dp)
    # tight active-cell capacity from the initial occupancy (x4 slack, like
    # cases._make_domain)
    cxyz = np.floor((pos - np.asarray(dom.posmin)) / dom.scell).astype(np.int64)
    cid = (cxyz[:, 2] * dom.nc[1] + cxyz[:, 1]) * dom.nc[0] + cxyz[:, 0]
    A = min(dom.ncells, pos.shape[0], max(1024, 4 * len(np.unique(cid))))
    import dataclasses
    dom = dataclasses.replace(dom, maxcells=A)
    st = C._make_state(csp, pos, code, zsurf=zfluid_max,
                       need_verlet=(opts.tstep == TpStep.VERLET),
                       need_sps=(tvisco == TpVisco.LAMINAR_SPS),
                       capacity=capacity,
                       normals=draw.normals if mdbc else None)
    npb = int(np.sum(td.code_type(code) < td.TYPE_FLOATING))
    case = C.Case(csp=csp, dom=dom, state=st, npb=npb, np_total=pos.shape[0],
                  meta=dict(name=P.get("CaseName", "xmlcase"), dp=dp,
                            zsurf=zfluid_max))
    run = dict(tmax=pf("TimeMax", 1.0), tout=pf("TimeOut", 0.01))
    return case, opts, run
