"""Run output manager + checkpoint/restart.

Bundles the per-PART output channels the reference writes from
`JSph::SaveData` (JSph.cpp:2717): bi4 PART snapshots (full checkpoints),
VTK particle dumps, CSV gauges — and implements the `-partbegin` restart
contract (SURVEY §5.4): any PART file restores the particle state, time and
step counters.
"""

from __future__ import annotations

import dataclasses
import os
import re

import jax.numpy as jnp
import numpy as np

from .. import typesdef as td
from . import floatdata, partdata, vtkout


class OutputTime:
    """Variable PART-output schedule (the reference JDsOutputTime /
    `<special><timeout>` table, `_FmtXML_TimeOut.xml`): piecewise-constant
    intervals [(t_i, timeout_i)]; interval(t) is the timeout of the last
    entry with t_i <= t."""

    def __init__(self, entries):
        entries = sorted((float(t), float(dt)) for t, dt in entries)
        if not entries or entries[0][0] > 0.0:
            raise ValueError("timeout table must start at time=0")
        self.entries = entries

    @classmethod
    def fixed(cls, tout):
        return cls([(0.0, tout)])

    @classmethod
    def from_xml(cls, node):
        """node: <timeout> element with <tout time=... timeout=.../> rows."""
        if node.get("active", "true").lower() in ("false", "0"):
            return None
        return cls([(float(el.get("time")), float(el.get("timeout")))
                    for el in node.findall("tout")])

    def interval(self, t):
        out = self.entries[0][1]
        for ti, dt in self.entries:
            if ti <= t + 1e-12:
                out = dt
            else:
                break
        return out


class OutputManager:
    """Attachable on_save callback: writes Part_XXXX.bi4 (+ optional VTK)."""

    def __init__(self, dirout, case, *, save_vtk=False, gauges=None,
                 casename=None, save_info=False, feats=None,
                 nortimes=False, posdouble=True, extraparts="",
                 svnormals=False, save_csv=False, csvsep=";"):
        self.dirout = dirout
        self.save_csv = save_csv
        self.csvsep = csvsep
        os.makedirs(dirout, exist_ok=True)
        self.feats = feats
        # -svextraparts cadence (JDsExtraDataSave::Config/CheckSave,
        # JDsExtraData.cpp:68-84): "" = default (save whenever the run
        # carries normals, so mDBC restart always works), int N = PARTs
        # divisible by N, range list = JRangeFilter match
        self._extraparts_n = None
        self._extraparts_set = None
        if extraparts:
            if extraparts.isdigit():
                self._extraparts_n = int(extraparts)
            else:
                from ..tools.common import parse_range_filter
                self._extraparts_set = set(
                    int(v) for v in parse_range_filter(extraparts))
                self._extraparts_n = 1
        self.svnormals = svnormals
        code = np.asarray(case.state.code)
        ptype = (code >> td.CODE_TYPE_SHIFT) & td.CODE_TYPE_MASK
        live = ((code >> td.CODE_SPECIAL_SHIFT) & td.CODE_SPECIAL_MASK) \
            < td.SPECIAL_OUT_POS
        counts = dict(
            np_total=int(live.sum()),
            nfixed=int((live & (ptype == td.TYPE_FIXED)).sum()),
            nmoving=int((live & (ptype == td.TYPE_MOVING)).sum()),
            nfloat=int((live & (ptype == td.TYPE_FLOATING)).sum()),
            nfluid=int((live & (ptype == td.TYPE_FLUID)).sum()),
        )
        self.writer = partdata.PartWriter(
            dirout, case.csp, casename=casename or case.meta.get("name", "case"),
            posmin=case.dom.posmin, posmax=case.dom.posmax,
            nortimes=nortimes, posdouble=posdouble, **counts)
        self.save_vtk = save_vtk
        self.gauges = gauges
        self.save_info = save_info
        self.files = []
        self._wall_prev = 0.0
        # Part_Head.ibi4 run metadata (JPartDataHead, read back for restart
        # validation — JSph::RestartCheckData JSph.cpp:1993)
        from . import floatdata
        floatdata.write_parthead(
            dirout, case.csp,
            casename=casename or case.meta.get("name", "case"),
            mapposmin=case.dom.posmin, mapposmax=case.dom.posmax)
        # floating-body history channel (PartFloat.fbi4, JPartFloatBi4)
        self.floatw = None
        if feats is not None and getattr(feats, "floating", None) is not None:
            fc = feats.floating
            self.floatw = floatdata.FloatBi4Writer(
                dirout,
                mkbound=np.arange(fc.count, dtype=np.uint16),
                begin=np.zeros(fc.count, np.uint32),
                count=np.zeros(fc.count, np.uint32),
                mass=np.asarray(fc.mass, np.float32),
                massp=np.asarray(fc.massp, np.float32))
        # excluded-particle stream (PartOut .obi4, JPartOutBi4Save)
        self.outw = floatdata.PartOutWriter(dirout)
        self._out_seen = set()
        # extra-data channel (PartExtra .bi4 with mDBC normals, JDsExtraData;
        # written whenever the run carries boundary normals so mDBC restart
        # works — the reference's -svextraparts default for mDBC)
        self._nbound = counts["nfixed"] + counts["nmoving"] + counts["nfloat"]
        self._nfloat = counts["nfloat"]

    def __call__(self, sim):
        cpart = sim.part
        path = self.writer.save(cpart, sim.time, sim.state,
                                nstep=int(sim.carry.nstep),
                                runtime=getattr(sim, "walltime", 0.0))
        self.files.append(path)
        if self.save_vtk:
            vtkout.write_state_vtk(
                os.path.join(self.dirout, f"PartVtk_{cpart:04d}.vtk"),
                sim.state)
        if self.save_csv:
            self.write_csv(sim, cpart)
        if self.gauges is not None:
            self.gauges.run(sim.time, sim.state)
            self.gauges.save_csv(self.dirout)
        if sim.carry.dthist is not None:
            self.drain_savedt(sim)
        if sim.carry.fthist is not None:
            self.drain_ftmotion(sim)
        if getattr(sim.carry, "moor", None) is not None:
            self.save_moorings(sim)
        if self.save_info:
            self.write_info(sim)
        save_extra = sim.state.boundnormal is not None and self._nbound
        if save_extra and self._extraparts_n is not None:
            # explicit -svextraparts cadence (JDsExtraDataSave::CheckSave)
            save_extra = (cpart > 0 and cpart % self._extraparts_n == 0
                          and (self._extraparts_set is None
                               or cpart in self._extraparts_set))
        if save_extra:
            from . import extradata
            extradata.save_extradata(
                self.dirout, cpart, sim.time, sim.state,
                casenbound=self._nbound, casenfloat=self._nfloat,
                usenormalsft=self._nfloat > 0, nstep=int(sim.carry.nstep))
        if self.svnormals and sim.state.boundnormal is not None:
            # -svnormals: per-PART boundary-normal VTK
            # (SaveVtkNormals, JSphCpuSingle.cpp:1177)
            ndir = os.path.join(self.dirout, "normals")
            os.makedirs(ndir, exist_ok=True)
            code = np.asarray(sim.state.code)
            live = ((code >> td.CODE_SPECIAL_SHIFT) & td.CODE_SPECIAL_MASK) \
                < td.SPECIAL_OUT_POS
            bnd = live & (((code >> td.CODE_TYPE_SHIFT) & td.CODE_TYPE_MASK)
                          < td.TYPE_FLUID)
            vtkout.write_vtk_particles(
                os.path.join(ndir, f"Normals_{cpart:04d}.vtk"),
                np.asarray(sim.state.pos)[bnd],
                {"Idp": np.asarray(sim.state.idp)[bnd],
                 "Normal": np.asarray(sim.state.boundnormal)[bnd]})
        if self.floatw is not None and sim.state.ft is not None:
            ft = sim.state.ft
            self.floatw.save_part(
                cpart, sim.time, step=int(sim.carry.nstep),
                center=np.asarray(ft.center), fvel=np.asarray(ft.fvel),
                fomega=np.asarray(ft.fomega))
        self.drain_partout(sim)

    def write_csv(self, sim, cpart):
        """Per-particle CSV dump (`-sv:csv`, reference JOutputCsv::SaveCsv):
        one PartCsv_XXXX.csv per PART with the basic-array columns the
        reference registers in `JSph::AddBasicArrays` (JSph.cpp:2568)."""
        st = sim.state
        code = np.asarray(st.code)
        special = (code >> td.CODE_SPECIAL_SHIFT) & td.CODE_SPECIAL_MASK
        live = special < td.SPECIAL_OUT_POS
        pos = np.asarray(st.pos)[live]
        vel = np.asarray(st.vel)[live]
        rho = np.asarray(st.rho)[live]
        idp = np.asarray(st.idp)[live]
        ptype = (code[live] >> td.CODE_TYPE_SHIFT) & td.CODE_TYPE_MASK
        s = self.csvsep
        path = os.path.join(self.dirout, f"PartCsv_{cpart:04d}.csv")
        with open(path, "w") as f:
            f.write(s.join(["Idp", "Pos.x [m]", "Pos.y [m]", "Pos.z [m]",
                            "Vel.x [m/s]", "Vel.y [m/s]", "Vel.z [m/s]",
                            "Rhop [kg/m^3]", "Type"]) + "\n")
            order = np.argsort(idp, kind="stable")
            # vectorized rows (a per-row f-string loop stalls saves at
            # realistic particle counts)
            cols = np.column_stack([
                idp[order].astype(np.int64), pos[order],
                vel[order], rho[order], ptype[order].astype(np.int64)])
            np.savetxt(f, cols, delimiter=s,
                       fmt=["%d"] + ["%.7g"] * 7 + ["%d"])

    def drain_partout(self, sim):
        """Stream newly-excluded particles to PartOut .obi4 (the host drain
        of the fixed-capacity design: the solver marks them SPECIAL_OUT_*
        in place, the reference compacts + streams per divide)."""
        code = np.asarray(sim.state.code)
        special = (code >> td.CODE_SPECIAL_SHIFT) & td.CODE_SPECIAL_MASK
        # OUT_IGNORE marks unused capacity slots, not excluded particles
        out = (special >= td.SPECIAL_OUT_POS) & \
            (special < td.SPECIAL_OUT_IGNORE)
        idp = np.asarray(sim.state.idp)
        new = [k for k in np.where(out)[0] if idp[k] not in self._out_seen]
        if not new:
            return
        new = np.asarray(new)
        self._out_seen.update(idp[new].tolist())
        from .floatdata import MOTIVE_MOVE, MOTIVE_POS, MOTIVE_RHOP
        motive = np.where(special[new] == td.SPECIAL_OUT_RHOP, MOTIVE_RHOP,
                          np.where(special[new] == td.SPECIAL_OUT_MOVE,
                                   MOTIVE_MOVE, MOTIVE_POS)).astype(np.uint8)
        self.outw.save_part(
            sim.part, sim.time, idp=idp[new],
            pos=np.asarray(sim.state.pos)[new],
            vel=np.asarray(sim.state.vel)[new],
            rhop=np.asarray(sim.state.rho)[new], motive=motive)

    def write_info(self, sim):
        """Per-PART runtime info (the `-sv:info` `.ibi4` channel,
        `StInfoPartPlus` `JSphCpuSingle.cpp:1151-1165`, as CSV): particle
        breakdown, step counters, dt diagnostics, wall time."""
        code = np.asarray(sim.state.code)
        ptype = (code >> td.CODE_TYPE_SHIFT) & td.CODE_TYPE_MASK
        live = ((code >> td.CODE_SPECIAL_SHIFT) & td.CODE_SPECIAL_MASK) \
            < td.SPECIAL_OUT_POS
        path = os.path.join(self.dirout, "PartInfo.csv")
        newfile = not os.path.exists(path)
        import time as _time
        wall = getattr(sim, "walltime", 0.0) or 0.0
        with open(path, "a") as f:
            if newfile:
                f.write("Part;TimeStep;Nstep;Np;NpFixed;NpMoving;NpFloat;"
                        "NpFluid;NpOut;DtModif;Overflow\n")
            f.write(
                f"{sim.part};{sim.time:.6f};{int(sim.carry.nstep)};"
                f"{int(live.sum())};"
                f"{int((live & (ptype == td.TYPE_FIXED)).sum())};"
                f"{int((live & (ptype == td.TYPE_MOVING)).sum())};"
                f"{int((live & (ptype == td.TYPE_FLOATING)).sum())};"
                f"{int((live & (ptype == td.TYPE_FLUID)).sum())};"
                f"{int((~live).sum())};"
                f"{int(sim.carry.dtmodif)};{int(sim.carry.overflow)}\n")

    _savedt_last = 0
    _ftmot_last = 0
    _ftmot_tnext = 0.0
    ftmotion_tout = 0.0          # tout2 cadence; 0 = every recorded dt

    def drain_ftmotion(self, sim):
        """Append the per-dt floating motion ring to PartFloatMotion.fbi4
        (JFtMotionSave: dt-level record at its own tout2 cadence,
        `JSphCpuSingle.cpp:1000-1003`)."""
        if self.feats is None or self.feats.floating is None:
            return
        if not hasattr(self, "ftmotw"):
            fc = self.feats.floating
            self.ftmotw = floatdata.FloatBi4Writer(
                self.dirout,
                mkbound=np.arange(fc.count, dtype=np.uint16),
                begin=np.zeros(fc.count, np.uint32),
                count=np.zeros(fc.count, np.uint32),
                mass=np.asarray(fc.mass, np.float32),
                massp=np.asarray(fc.massp, np.float32),
                filename="PartFloatMotion.fbi4")
        hist = np.asarray(sim.carry.fthist)
        cap, b = hist.shape[0], self.feats.floating.count
        cur = int(sim.carry.nstep)
        lo = max(self._ftmot_last, cur - cap)
        for s in range(lo, cur):
            r = hist[s % cap]
            t = float(r[0])
            if self.ftmotion_tout and t < self._ftmot_tnext:
                continue
            if self.ftmotion_tout:
                while self._ftmot_tnext <= t:
                    self._ftmot_tnext += self.ftmotion_tout
            self.ftmotw.save_part(
                s, t, step=s,
                center=r[1:1 + 3 * b].reshape(b, 3),
                fvel=r[1 + 3 * b:1 + 6 * b].reshape(b, 3),
                fomega=r[1 + 6 * b:1 + 9 * b].reshape(b, 3), flush=False)
        self.ftmotw._flush()
        self._ftmot_last = cur

    def save_moorings(self, sim):
        """Per-PART mooring output (the reference's savevtk_lines +
        savecsv_points / <savedata> tension/force/position/velocity,
        _FmtXML_MoorDyn.xml): line-node polylines to
        MooringsVtk/MooringsLines_XXXX.vtk and fairlead tension/position
        rows appended to MooringsPoints.csv."""
        moor = sim.carry.moor
        cfg = self.feats.moorings if self.feats is not None else None
        if moor is None or cfg is None:
            return
        from . import vtkout
        P = np.asarray(moor.pos)          # (L, NM+1, 3)
        tens = np.asarray(cfg.fairlead_tensions(moor))
        nseg = [ln.nseg for ln in cfg.lines]
        mdir = os.path.join(self.dirout, "MooringsVtk")
        os.makedirs(mdir, exist_ok=True)
        pts, lines = [], []
        off = 0
        for k, ns in enumerate(nseg):
            pts.append(P[k, :ns + 1])
            lines.append(np.arange(off, off + ns + 1))
            off += ns + 1
        vtkout.write_vtk_mesh(
            os.path.join(mdir, f"MooringsLines_{sim.part:04d}.vtk"),
            np.concatenate(pts, axis=0), lines=lines)
        csvp = os.path.join(self.dirout, "MooringsPoints.csv")
        newfile = not os.path.exists(csvp)
        with open(csvp, "a") as f:
            if newfile:
                f.write("time;line;broken;posx;posy;posz;velx;vely;velz;"
                        "tenx;teny;tenz;tension\n")
            V = np.asarray(moor.vel)
            brk = np.asarray(moor.broken)
            for k, ns in enumerate(nseg):
                p = P[k, ns]
                v = V[k, ns]
                tv = tens[k]
                f.write(f"{sim.time:.6f};{k};{int(brk[k])};"
                        f"{p[0]:.6g};{p[1]:.6g};{p[2]:.6g};"
                        f"{v[0]:.6g};{v[1]:.6g};{v[2]:.6g};"
                        f"{tv[0]:.6g};{tv[1]:.6g};{tv[2]:.6g};"
                        f"{np.linalg.norm(tv):.6g}\n")

    def drain_savedt(self, sim):
        """Append the per-dt diagnostics recorded since the last save to
        SaveDt.csv (reference JDsSaveDt output, `_FmtXML_SaveDt.xml`)."""
        hist = np.asarray(sim.carry.dthist)
        cap = hist.shape[0]
        cur = int(sim.carry.nstep)
        lo = max(self._savedt_last, cur - cap)
        path = os.path.join(self.dirout, "SaveDt.csv")
        newfile = not os.path.exists(path)
        with open(path, "a") as f:
            if newfile:
                f.write("Step;Time;Dt;Dt1;Dt2;AceMax;ViscDtMax\n")
            for s in range(lo, cur):
                r = hist[s % cap]
                f.write(f"{s};{r[0]:.7e};{r[1]:.7e};{r[2]:.7e};"
                        f"{r[3]:.7e};{r[4]:.7e};{r[5]:.7e}\n")
        self._savedt_last = cur


def restart_state(path, template_state):
    """Rebuild a SimState from a PART file (the `-partbegin` contract,
    JPartsLoad4::LoadParticles + JSph::InitRun).  The template provides the
    capacity/optional-field layout; returns (state, timestep, nstep)."""
    d = partdata.read_part(path)
    cap = template_state.n
    npok = len(d["idp"])
    if npok > cap:
        raise ValueError(f"restart needs {npok} slots, capacity is {cap}")

    def filled(base, arr, fill):
        out = np.full_like(np.asarray(base), fill)
        out[:npok] = arr
        return jnp.asarray(out, np.asarray(base).dtype)

    pos = np.full((cap, 3), -1e6, np.float64)
    pos[:npok] = d["pos"]
    vel = np.zeros((cap, 3), np.float32)
    vel[:npok] = d["vel"]
    rho = np.full((cap,), 1000.0, np.float32)
    rho[:npok] = d["rhop"]
    idp = np.arange(cap, dtype=np.uint32)
    idp[:npok] = d["idp"]
    code = np.full((cap,), td.code_make(td.TYPE_FLUID, 0,
                                        td.SPECIAL_OUT_IGNORE), np.uint32)
    if d["code"] is not None:
        code[:npok] = d["code"]
    else:
        # reconstruct typecodes from the id layout (GenCase convention)
        c = d["counts"]
        bnd = d["idp"] < c["CaseNfixed"]
        mov = (d["idp"] >= c["CaseNfixed"]) & \
              (d["idp"] < c["CaseNfixed"] + c["CaseNmoving"])
        flt = (d["idp"] >= c["CaseNfixed"] + c["CaseNmoving"]) & \
              (d["idp"] < c["CaseNfixed"] + c["CaseNmoving"] + c["CaseNfloat"])
        code[:npok] = td.code_make(td.TYPE_FLUID, 0)
        code[:npok][bnd] = td.code_make(td.TYPE_FIXED, 0)
        code[:npok][mov] = td.code_make(td.TYPE_MOVING, 0)
        code[:npok][flt] = td.code_make(td.TYPE_FLOATING, 0)

    st = dataclasses.replace(
        template_state,
        pos=jnp.asarray(pos, np.asarray(template_state.pos).dtype),
        vel=jnp.asarray(vel, jnp.float32),
        rho=jnp.asarray(rho, jnp.float32),
        idp=jnp.asarray(idp),
        code=jnp.asarray(code))
    # mDBC normals from the PartExtra channel (JDsExtraDataLoad::LoadNormals;
    # without it an mDBC restart would run with zero normals)
    from . import extradata
    m = re.search(r"Part_?(\d+)\.bi4$", os.path.basename(path))
    if m is not None:
        extra = extradata.load_extradata(os.path.dirname(path) or ".",
                                         int(m.group(1)))
        if extra is not None:
            nor = extradata.apply_normals(extra, idp, code, cap)
            st = dataclasses.replace(st, boundnormal=jnp.asarray(nor))
    return st, d["timestep"], d["nstep"]
