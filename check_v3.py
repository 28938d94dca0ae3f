"""Quick v3-vs-oracle check (interpret mode, CPU) + on-chip parity check."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
import jax.numpy as jnp

from dualsphysics_multilayer_tpu import typesdef as td
from dualsphysics_multilayer_tpu.ops import celldiv as cd
from dualsphysics_multilayer_tpu.ops import forces as F
from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
from dualsphysics_multilayer_tpu.ops.pallas import cellforce as CF


def cloud(n=700, seed=0, sim2d=False, frac_bound=0.25, nfloat=30):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 0.2, size=(n, 3)).astype(np.float32)
    if sim2d:
        pos[:, 1] = 0.0
    vel = rng.normal(0, 0.5, size=(n, 3)).astype(np.float32)
    if sim2d:
        vel[:, 1] = 0.0
    rho = (1000.0 * (1 + rng.normal(0, 0.01, size=n))).astype(np.float32)
    kinds = np.full(n, td.TYPE_FLUID, np.uint32)
    kinds[: int(n * frac_bound)] = td.TYPE_FIXED
    kinds[int(n * frac_bound): int(n * frac_bound) + nfloat] = td.TYPE_FLOATING
    code = np.array([td.code_make(int(k), 1 if k == td.TYPE_FLOATING else 0)
                     for k in kinds], np.uint32)
    return pos, vel, rho, code


def make_csp(sim2d=False):
    from dualsphysics_multilayer_tpu.typesdef import make_ctesph
    return make_ctesph(dp=0.012, simulate2d=sim2d, hswl=0.2, visco=0.05)


def run_case(tdensity, shift, sim2d, kill_some=0, seed=0):
    csp = make_csp(sim2d)
    opts = SolverOpts(tdensity=tdensity, use_pallas=True, shiftmode=shift,
                      with_floating=True)
    pos, vel, rho, code = cloud(sim2d=sim2d, seed=seed)
    dom = cd.make_domain(pos.min(0) - 0.01, pos.max(0) + 0.01, csp.kernelsize,
                         simulate2d=sim2d, cellcap=64)
    T, W = CF.tiles_rows(dom)
    n = len(pos)
    NP = cd.rowdiv_capacity(dom, n, T)
    pad = NP - n
    deadc = np.uint32(td.code_make(td.TYPE_FIXED, 0, td.SPECIAL_OUT_IGNORE))
    posp = jnp.pad(jnp.asarray(pos), ((0, pad), (0, 0)))
    codep = jnp.pad(jnp.asarray(code), (0, pad), constant_values=deadc)
    v3p = CF.v3_params(dom, NP)
    rd, code2 = cd.divide_rows(dom, posp, codep, tile_t=T, tile_w=W, v3=v3p)
    assert int(rd.overflow) == 0, int(rd.overflow)
    velp = jnp.pad(jnp.asarray(vel), ((0, pad), (0, 0)))
    rhop = jnp.pad(jnp.asarray(rho), (0, pad), constant_values=1.0)
    if kill_some:
        kill = np.zeros(NP, bool)
        fl = np.where(np.asarray(td.code_type(code2)) == td.TYPE_FLUID)[0]
        kill[fl[:kill_some]] = True
        code2 = jnp.where(jnp.asarray(kill),
                          td.code_set_special(code2, td.SPECIAL_OUT_POS),
                          code2)

    def to_slots(a, fill=0.0):
        return cd.gather(a, rd.perm, fill=fill)

    code_s = jnp.where(rd.perm < NP, jnp.take(code2,
                                              jnp.minimum(rd.perm, NP - 1)),
                       deadc)
    ftomassp = np.full(4, csp.massfluid * 1.1, np.float32)
    got = CF.interaction_forces_rows_v3(
        csp, opts, dom, rd, to_slots(posp), to_slots(velp),
        to_slots(rhop, fill=1.0), code_s, ftomassp=ftomassp,
        interpret=(jax.default_backend() == "cpu"))

    # oracle: O(N^2) reference forces on live particles, canonical order
    press = CF._press(csp, jnp.asarray(rhop))
    div, codeo = cd.divide(dom, posp, code2)
    want = F.interaction_forces(csp, opts, div, posp, jnp.asarray(velp),
                                jnp.asarray(rhop), press, codeo,
                                ftomassp=ftomassp)
    # map kernel (slot-order) output back to canonical for comparison
    inv = np.full(NP, NP, np.int64)
    permn = np.asarray(rd.perm)
    m = permn < NP
    inv[permn[m]] = np.where(m)[0]
    live = np.asarray(td.is_active(codeo)) & (inv < NP)

    def gath(a):
        a = np.asarray(a)
        out = np.zeros((NP,) + a.shape[1:], a.dtype)
        out[inv < NP] = a[inv[inv < NP]]
        return out

    ok = True
    for name, g_, w_ in [("ace", gath(got.ace), np.asarray(want.ace)),
                         ("ar", gath(got.ar), np.asarray(want.ar))]:
        scale = np.abs(w_[live]).max() + 1e-10
        err = np.abs(g_[live] - w_[live]).max() / scale
        print(f"  {name}: rel err {err:.2e}")
        ok &= err < 2e-4
    vd = abs(float(got.viscdtmax) - float(want.viscdtmax)) \
        / (abs(float(want.viscdtmax)) + 1e-10)
    print(f"  viscdt: rel err {vd:.2e}")
    ok &= vd < 1e-3
    if shift.value:
        g_, w_ = gath(got.shiftposfs), np.asarray(want.shiftposfs)
        scale = np.abs(w_[live]).max() + 1e-10
        err = np.abs(g_[live] - w_[live]).max() / scale
        print(f"  shift: rel err {err:.2e}")
        ok &= err < 2e-4
        gb, wb = gath(got.shift_blocked.astype(np.int32)), \
            np.asarray(want.shift_blocked.astype(jnp.int32))
        mism = int((gb[live] != wb[live]).sum())
        print(f"  shift_blocked mismatches: {mism}")
        ok &= mism == 0
    return ok


if __name__ == "__main__":
    allok = True
    for tdens, shift, sim2d, kill in [
            (td.TpDensity.FOURTAKAS, td.TpShifting.NONE, False, 0),
            (td.TpDensity.MOLTENI, td.TpShifting.NO_FIXED, False, 17),
            (td.TpDensity.NONE, td.TpShifting.NO_BOUND, False, 0),
            (td.TpDensity.FOURTAKAS, td.TpShifting.NONE, True, 5),
    ]:
        print(f"case tdens={tdens.name} shift={shift.name} 2d={sim2d} "
              f"kill={kill}")
        allok &= run_case(tdens, shift, sim2d, kill_some=kill)
    print("ALL OK" if allok else "FAILURES")
    sys.exit(0 if allok else 1)
