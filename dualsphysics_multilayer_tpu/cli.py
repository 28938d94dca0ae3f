"""Command-line entry point.

The analog of the reference `main.cpp` + `JSphCfgRun` (flag surface
`JSphCfgRun.cpp:85-208`): loads a case (DualSPHysics XML, a restart PART, or
a built-in benchmark case), merges CLI overrides, runs the solver, writes
bi4/VTK/CSV output, and prints the run resume.

    dsphtpu -case examples/CaseDambreak_Def.xml -dirout out -sv:vtk
    dsphtpu -builtin dambreak3d -dp 0.01 -tmax 1.6 -tout 0.02
    dsphtpu -case ... -partbegin:20 out_prev   # restart
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(
        prog="dsphtpu",
        description="TPU-native SPH solver (DualSPHysics-capability rebuild)")
    p.add_argument("-case", help="DualSPHysics case XML (*_Def.xml)")
    p.add_argument("-builtin", help="built-in case: dambreak2d dambreak3d "
                                    "floatingbox2d waveflume2d")
    p.add_argument("-dp", type=float, default=0.0, help="override dp (builtin)")
    p.add_argument("-dirout", default="out", help="output directory")
    p.add_argument("-tmax", type=float, default=None)
    p.add_argument("-tout", type=float, default=None)
    p.add_argument("-symplectic", action="store_true")
    p.add_argument("-verlet", type=int, nargs="?", const=40, default=None,
                   metavar="STEPS")
    p.add_argument("-wendland", action="store_true")
    p.add_argument("-cubic", action="store_true")
    p.add_argument("-viscoart", type=float, default=None, metavar="V")
    p.add_argument("-viscolamsps", type=float, default=None, metavar="V")
    p.add_argument("-viscoboundfactor", type=float, default=None)
    p.add_argument("-ddt", type=int, default=None, choices=[0, 1, 2, 3])
    p.add_argument("-ddtvalue", type=float, default=None)
    p.add_argument("-shifting", type=int, default=None, choices=[0, 1, 2, 3])
    p.add_argument("-mdbc", action="store_true")
    p.add_argument("-cfl", type=float, default=None)
    p.add_argument("-rhopout", default=None, metavar="MIN:MAX")
    p.add_argument("-sv", default="binx",
                   help="output formats: binx,vtk,csv,none (comma list)")
    p.add_argument("-partbegin", type=int, default=None, metavar="N")
    p.add_argument("-restartdir", default=None,
                   help="directory holding the restart PART files")
    p.add_argument("-nsteps", type=int, default=None,
                   help="debug: stop after N steps")
    p.add_argument("-pallas", action="store_true", default=None,
                   help="force the Pallas force kernel")
    p.add_argument("-no-pallas", dest="pallas", action="store_false")
    p.add_argument("-ver", action="store_true", help="print version and exit")
    p.add_argument("-info", action="store_true",
                   help="print features/hardware JSON and exit")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import dualsphysics_multilayer_tpu as dsph
    if args.ver:
        print(json.dumps({
            "name": "dualsphysics_multilayer_tpu",
            "version": dsph.__version__,
            "features": ["wcsph", "dbc", "mdbc", "verlet", "symplectic",
                         "wendland", "cubic", "ddt", "shifting",
                         "laminar+sps", "floating", "motion", "damping",
                         "accinput", "gauges", "bi4", "vtk", "restart",
                         "sharding", "pallas"]}))
        return 0
    if args.info:
        # the analog of the reference's -info feature report (main.cpp:102-133)
        import jax as _jax
        devs = _jax.devices()
        print(json.dumps({
            "name": "dualsphysics_multilayer_tpu",
            "version": dsph.__version__,
            "features": {
                "solvers": ["wcsph", "nnewtonian-multiphase"],
                "kernels": ["wendland", "cubic"],
                "steps": ["symplectic", "verlet"],
                "viscosity": ["artificial", "laminar+sps", "consteq-hbp"],
                "ddt": ["none", "molteni", "fourtakas", "fourtakas-full"],
                "boundary": ["dbc", "mdbc(vel0,noslip,freeslip)"],
                "open_boundaries": ["periodic", "inlet/outlet"],
                "bodies": ["floating-6dof", "dem", "moorings", "forcepoints"],
                "waves": ["piston(1st/2nd,ramp,awas)", "flap-theory",
                          "relaxation-zones", "multilayer-piston-1d"],
                "io": ["bi4", "vtk", "csv", "restart", "savedt", "xml-case"],
                "scaling": ["single-chip-pallas", "mesh-domain-sharding"],
            },
            "backend": _jax.default_backend(),
            "devices": [str(d) for d in devs],
        }, indent=1))
        return 0

    import jax
    from .models import cases as C
    from .models.wcsph import Simulation
    from .io.output import OutputManager, restart_state
    from .ops.forces import SolverOpts
    from .typesdef import (TpBoundary, TpDensity, TpKernel, TpShifting,
                           TpSlipMode, TpStep, TpVisco)

    # ---- load case ----------------------------------------------------------
    if args.case:
        from .io.xmlcase import load_case
        case, opts, run = load_case(args.case, mdbc=args.mdbc)
    elif args.builtin:
        kw = {}
        if args.dp:
            kw["dp"] = args.dp
        builder = getattr(C, args.builtin)
        if args.builtin == "dambreak2d" and args.mdbc:
            kw["mdbc"] = True
        case = builder(**kw)
        opts = SolverOpts(tdensity=TpDensity.FOURTAKAS)
        run = dict(tmax=1.0, tout=0.05)
    else:
        print("error: give -case <xml> or -builtin <name>", file=sys.stderr)
        return 2

    # ---- CLI overrides (JSph::LoadConfigCommands analog) ---------------------
    csp = case.csp
    oc = {}
    if args.verlet is not None:
        oc.update(tstep=TpStep.VERLET, verlet_steps=args.verlet)
    if args.symplectic:
        oc.update(tstep=TpStep.SYMPLECTIC)
    if args.viscoart is not None:
        oc.update(tvisco=TpVisco.ARTIFICIAL)
        csp = csp.replace(visco=args.viscoart)
    if args.viscolamsps is not None:
        oc.update(tvisco=TpVisco.LAMINAR_SPS)
        csp = csp.replace(visco=args.viscolamsps)
    if args.ddt is not None:
        oc.update(tdensity=TpDensity(args.ddt))
    if args.shifting is not None:
        oc.update(shiftmode=TpShifting(args.shifting))
    if args.mdbc:
        oc.update(tboundary=TpBoundary.MDBC, slipmode=TpSlipMode.VEL0)
    if args.pallas is not None:
        oc.update(use_pallas=args.pallas)
    elif jax.default_backend() != "cpu":
        oc.update(use_pallas=True)
    opts = dataclasses.replace(opts, **oc)
    if args.wendland:
        csp = csp.replace(tkernel=TpKernel.WENDLAND)
    if args.cubic:
        csp = csp.replace(tkernel=TpKernel.CUBIC)
    if args.viscoboundfactor is not None:
        csp = csp.replace(viscoboundfactor=args.viscoboundfactor)
    if args.cfl is not None:
        csp = csp.replace(cflnumber=args.cfl)
    if args.rhopout:
        lo, hi = args.rhopout.split(":")
        csp = csp.replace(rhopoutmin=float(lo), rhopoutmax=float(hi))
    if args.ddtvalue is not None:
        csp = csp.replace(ddtvalue=args.ddtvalue,
                          ddtkh=csp.kernelsize * args.ddtvalue)
    tmax = args.tmax if args.tmax is not None else run["tmax"]
    tout = args.tout if args.tout is not None else run["tout"]

    st = case.state
    t0 = 0.0
    if args.partbegin is not None:
        from .io.partdata import part_filename
        import os
        pdir = args.restartdir or args.dirout
        path = os.path.join(pdir, part_filename(args.partbegin))
        st, t0, _ = restart_state(path, st)
        print(f"restart from {path} at t={t0:.6f}")

    feats = case.meta.get("features")
    if feats is None and ("ftcfg" in case.meta or "motion" in case.meta):
        from .features.featureset import Features
        feats = Features(
            motions=(case.meta["motion"],) if "motion" in case.meta else (),
            floating=case.meta.get("ftcfg"))
    if feats is not None and feats.floating is not None:
        opts = dataclasses.replace(opts, with_floating=True)

    sim = Simulation(csp, opts, case.dom, st, feats=feats)
    sim.time = t0
    sv = set(args.sv.split(","))
    on_save = None
    if sv - {"none"}:
        on_save = OutputManager(args.dirout, case, save_vtk="vtk" in sv,
                                save_info="info" in sv)

    print(f"[dsphtpu] case={case.meta.get('name')} np={case.np_total} "
          f"dp={csp.dp:g} h={csp.kernelh:g} cs0={csp.cs0:g} "
          f"backend={jax.default_backend()} pallas={opts.use_pallas}")
    wall0 = time.time()
    sim.run(tmax=tmax, tout=tout, on_save=on_save, max_steps=args.nsteps)
    wall = time.time() - wall0
    nstep = int(sim.carry.nstep)
    print(f"[dsphtpu] done: t={sim.time:.6g} steps={nstep} "
          f"wall={wall:.1f}s ({case.np_total * nstep / max(wall, 1e-9):.3g} "
          f"particle-steps/s) parts={sim.part} dtmodif={int(sim.carry.dtmodif)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
