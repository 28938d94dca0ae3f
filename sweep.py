"""Sweep kernel structure params on TPU: T_BLOCK, GROUP_SX, R ablation."""
import functools, time, dataclasses
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dualsphysics_multilayer_tpu.models import cases
from dualsphysics_multilayer_tpu.ops import celldiv as cd
from dualsphysics_multilayer_tpu.ops.pallas import cellforce as CF
from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
from dualsphysics_multilayer_tpu import typesdef as td

case = cases.dambreak3d(dp=0.0085)
csp, dom, st = case.csp, case.dom, case.state
n = st.n
opts = SolverOpts(tdensity=td.TpDensity.FOURTAKAS, use_pallas=True)


def timeit(f, *a, n_=20):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n_ * 1e3, out


def run_cfg(T, SX, Rkeep=None, label=""):
    W = max(-(-((SX + 2) * dom.cellcap + 127) // 128) * 128, 256)
    sd, code = cd.divide_sorted(dom, st.pos, st.code, tile_t=T, tile_w=W,
                                group_sx=SX,
                                maxgroups=-(-dom.ncells // SX) + -(-n // T) + 64)
    perm = sd.order
    pos = st.pos[perm]; vel = st.vel[perm]; rho = st.rho[perm]
    code2 = code[perm]
    sd = dataclasses.replace(sd, order=jnp.arange(n, dtype=jnp.int32))
    C = CF.c_for(opts); CO = CF.co_for(opts)
    R = sd.wstart.shape[1]

    ikind = td.code_type(code2)
    kind = ikind.astype(jnp.float32)
    press = CF._press(csp, rho)
    mass = jnp.where(ikind >= td.TYPE_FLUID, csp.massfluid,
                     csp.massbound).astype(jnp.float32)
    packed = jnp.stack([pos[:, 0], pos[:, 1], pos[:, 2], vel[:, 0],
                        vel[:, 1], vel[:, 2], rho, press, 1.0 / rho, kind,
                        mass], axis=0)
    packed = jnp.pad(packed, ((0, C - packed.shape[0]), (0, 0)))
    sf = jnp.stack([jnp.pad(packed, ((0, 0), (k * CF.GSHIFT,
                                     W + CF.CW - k * CF.GSHIFT)))
                    for k in range(CF.NSHIFT)], axis=0)
    tidx = sd.tstart[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    tidx = jnp.minimum(tidx, n - 1 + W)
    tgt = jnp.transpose(sf[0], (1, 0))[tidx]

    A = sd.tstart.shape[0]
    CA = min(-(-A // 8) * 8, 16384)
    if A > CA:
        print(f"  [skip {label}: A={A} > {CA}]"); return
    padA = CA - A
    tcount = jnp.pad(sd.tcount, (0, padA))
    wstart = jnp.pad(sd.wstart + sd.woff, ((0, padA), (0, 0)))
    wcount = jnp.pad(sd.wcount, ((0, padA), (0, 0)))
    tgtp = jnp.pad(tgt, ((0, padA), (0, 0), (0, 0)))
    if Rkeep is not None:
        wstart = wstart[:, :Rkeep]
        wcount = wcount[:, :Rkeep]
        R = Rkeep
    viscov = jnp.reshape(jnp.asarray(csp.visco, jnp.float32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(CA,),
        in_specs=[pl.BlockSpec((1, T, C), lambda a, *_: (a, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, T, CO), lambda a, *_: (a, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, C, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((R, 2))])
    kern = functools.partial(CF._kernel, csp=csp, opts=opts, R=R, T=T, W=W,
                             CW=CF.CW, CO=CO, C=C)
    call = pl.pallas_call(kern, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((CA, T, CO),
                                                         jnp.float32))

    @jax.jit
    def pure(tc, ws, wc, vv, tg, sfa):
        return call(tc, ws, wc, vv, tg, sfa)

    args = (tcount, wstart.reshape(-1), wcount.reshape(-1), viscov, tgtp, sf)
    t, out = timeit(pure, *args)
    nact = int(jnp.sum(sd.tcount > 0))
    wc_np = np.asarray(sd.wcount); tc_np = np.asarray(sd.tcount)
    act = tc_np > 0
    nch = np.ceil((8 + wc_np) / CF.CW).astype(int)  # approx wo~8
    print(f"{label}: {t:6.2f} ms  A={A} active={nact} "
          f"mean_tc={tc_np[act].mean():.1f} chunks/blk={nch[act].sum(1).mean():.1f} "
          f"({t/nact*1e6:.2f} us/blk)")


import sys
run_cfg(48, 16, label="T=48 SX=16 (base)")
run_cfg(48, 16, Rkeep=1, label="T=48 SX=16 R=1  ")
run_cfg(48, 16, Rkeep=3, label="T=48 SX=16 R=3  ")
run_cfg(96, 16, label="T=96 SX=16       ")
run_cfg(96, 32, label="T=96 SX=32       ")
run_cfg(192, 32, label="T=192 SX=32      ")
run_cfg(24, 8, label="T=24 SX=8        ")
