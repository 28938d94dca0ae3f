"""Phase breakdown for the bench dam break: divide / glue / kernel / step.

Prints the structural stats of the row-padded layout (window sizes, live-lane
fractions) plus wall-clock for each phase, so kernel work is steered by data
(VERDICT r2 item 1).  Run on the real chip:  python profile_step.py [np]

Reference analog: `-svtimers` phase ontology (JDsTimersGpu.h:29-49).
"""
import json
import os
import sys
import time

import jax
from dualsphysics_multilayer_tpu.utils.compilecache import enable_cache
enable_cache()
import jax.numpy as jnp
import numpy as np

from dualsphysics_multilayer_tpu.models import cases
from dualsphysics_multilayer_tpu.models import wcsph as W
from dualsphysics_multilayer_tpu.ops import celldiv as cd
from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
from dualsphysics_multilayer_tpu.ops.pallas import cellforce as CF
from dualsphysics_multilayer_tpu import typesdef as td


def timeit(f, *a, n=10):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    dp = (0.11 / n_target) ** (1.0 / 3.0)
    case = cases.dambreak3d(dp=dp, obstacle=True)
    csp, dom, st = case.csp, case.dom, case.state
    opts = SolverOpts(tdensity=td.TpDensity.FOURTAKAS, use_pallas=True)
    T, Wd = CF.tiles_rows(dom)
    R = 3 if cd.rowdiv_merged(dom) else (3 if dom.simulate2d else 9)
    out = {
        "np": case.np_total, "dp": round(dp, 6), "nc": list(dom.nc),
        "ncells": dom.ncells, "cellcap": dom.cellcap,
        "T": T, "W": Wd, "R": R, "merged": cd.rowdiv_merged(dom),
        "scell": round(dom.scell, 6), "kernelsize": round(csp.kernelsize, 6),
    }

    carry = W.make_carry(st, csp, opts, dom=dom)
    rd = carry.rdiv
    NP = carry.st.n
    A = NP // T
    out["NP"] = NP
    out["A_blocks"] = A
    out["nactive"] = int(rd.nactive)
    out["used_slots"] = int(rd.used)

    # ---- structural stats: how much pair work the kernel actually does ----
    tc = np.asarray(rd.tcount)
    act = tc > 0
    out["mean_tcount"] = round(float(tc[act].mean()), 1)
    if rd.gblk is not None:
        # v3: per-block trimmed segments, 128-aligned chunks
        soff = np.asarray(rd.soff).reshape(-1)
        swc = np.asarray(rd.swc).reshape(-1)
        has = swc > 0
        chunks = ((soff[has] + swc[has] - 1) // 128 - soff[has] // 128 + 1)
        out["v3_ngrp"] = int(rd.ngrp)
        out["v3_nwide"] = int(rd.nwide)
        out["mean_wcount_per_row"] = round(float(swc[has].mean()), 1)
        out["sum_window_lanes"] = int(swc[has].sum())
        nch = int(chunks.sum())
    else:
        wc = np.asarray(rd.wcount)
        out["mean_wcount_per_row"] = round(float(wc[act].mean()), 1)
        out["sum_window_lanes"] = int(wc[act].sum())
        nch = int(np.maximum((wc[act] + 127) // 128, 0).sum())
    out["pair_chunks"] = int(nch)
    out["pair_lanes_computed"] = int(nch) * 128 * T
    # real pairs: count neighbours within kernelsize on a sample
    pos = np.asarray(carry.st.pos)
    code = np.asarray(carry.st.code)
    live = np.asarray(td.is_active(carry.st.code))
    idx = np.where(live)[0]
    samp = idx[:: max(1, len(idx) // 2000)][:2000]
    ks2 = csp.kernelsize ** 2
    realn = []
    lp = pos[live]
    for i in samp:
        d2 = ((lp - pos[i]) ** 2).sum(1)
        realn.append(int((d2 <= ks2).sum()))
    out["mean_real_neighbours"] = round(float(np.mean(realn)), 1)
    out["real_pairs_est"] = int(np.mean(realn) * live.sum())
    out["lane_efficiency_pct"] = round(
        100.0 * out["real_pairs_est"] / max(out["pair_lanes_computed"], 1), 2)

    # ---- phase timings ----
    st2 = carry.st
    reb = jax.jit(lambda s: W._rowdiv_rebuild(csp, dom, s))
    t_reb, _ = timeit(reb, st2)
    out["ms_divide_rebuild"] = round(t_reb, 2)

    kern = jax.jit(lambda rd_, p, v, r, c: CF.interaction_forces_rows(
        csp, opts, dom, rd_, p, v, r, c).ace)
    t_k, _ = timeit(kern, rd, st2.pos, st2.vel, st2.rho, st2.code)
    out["ms_kernel_plus_glue"] = round(t_k, 2)

    # glue front alone: packed field build + shifted copies (v1) or the
    # single padded copy (v3) + tgt reshape
    C = CF.c_for(opts)
    v3 = rd.gblk is not None
    WWpad = CF.v3_params(dom, NP)["WW"] + CF.CW if v3 else 0

    @jax.jit
    def glue(p, v, r, c):
        actv = td.is_active(c)
        ikind = td.code_type(c)
        kind = ikind.astype(jnp.float32)
        px = jnp.where(actv, p[:, 0],
                       jnp.float32(dom.posmin[0] - 20.0 * dom.scell))
        rho_s = jnp.where(actv, r, 1.0)
        vel_s = jnp.where(actv[:, None], v, 0.0)
        press = jnp.where(actv, CF._press(csp, rho_s), 0.0)
        mass = jnp.where(ikind >= td.TYPE_FLUID, csp.massfluid,
                         csp.massbound).astype(jnp.float32)
        chans = [px, p[:, 1], p[:, 2], vel_s[:, 0], vel_s[:, 1], vel_s[:, 2],
                 rho_s, press, 1.0 / rho_s, kind, mass]
        packed = jnp.stack(chans, axis=0)
        packed = jnp.pad(packed, ((0, C - packed.shape[0]), (0, 0)))
        if v3:
            sf = jnp.pad(packed, ((0, 0), (0, WWpad)))
        else:
            sf = jnp.stack([jnp.pad(packed, ((0, 0), (k * CF.GSHIFT,
                                              Wd + CF.CW - k * CF.GSHIFT)))
                            for k in range(CF.NSHIFT)], axis=0)
        tgt = jnp.transpose(packed, (1, 0)).reshape(A, T, C)
        return sf, tgt

    t_g, _ = timeit(glue, st2.pos, st2.vel, st2.rho, st2.code)
    out["ms_glue_front"] = round(t_g, 2)
    out["ms_kernel_only_est"] = round(t_k - t_g, 2)

    step = W.make_step(csp, opts, dom)
    stepj = jax.jit(step)
    t_s, _ = timeit(stepj, carry)
    out["ms_full_step"] = round(t_s, 2)
    out["ms_integrator_etc_est"] = round(t_s - 2 * t_k, 2)
    out["psps"] = round(case.np_total / (t_s / 1e3), 0)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
