"""Split kernel vs glue: time the bare pallas_call with prebuilt inputs."""
import time, functools, dataclasses
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
T, W = CF.tiles_for(dom)
print(f"n={n} cellcap={dom.cellcap} T={T} W={W} nc={dom.nc}")
sd, code = cd.divide_sorted(dom, st.pos, st.code, tile_t=T, tile_w=W,
                            group_sx=CF.GROUP_SX,
                            maxgroups=CF.maxgroups_for(dom, n))
perm = sd.order
pos = st.pos[perm]; vel = st.vel[perm]; rho = st.rho[perm]; code2 = code[perm]
sd = dataclasses.replace(sd, order=jnp.arange(n, dtype=jnp.int32))
print("nactive blocks:", int(sd.nactive), "A:", sd.tstart.shape[0],
      "overflow:", int(sd.overflow))

C = CF.c_for(opts); CO = CF.co_for(opts); R = sd.wstart.shape[1]

# --- prebuild all kernel inputs (the "glue front") ---
@jax.jit
def glue_front(pos, vel, rho, code, rsd):
    ikind = td.code_type(code)
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
    tidx = rsd.tstart[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    tidx = jnp.minimum(tidx, n - 1 + W)
    tgt = jnp.transpose(sf[0], (1, 0))[tidx]
    return sf, tgt

def timeit(f, *a, n_=20):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n_ * 1e3, out

tf, (sf, tgt) = timeit(glue_front, pos, vel, rho, code2, sd)
print(f"glue front: {tf:.2f} ms")

A = sd.tstart.shape[0]
CA = min(-(-A // 8) * 8, 8192)
nchunk = -(-A // CA)
padA = nchunk * CA - A
tcount = jnp.pad(sd.tcount, (0, padA))
wstart = jnp.pad(sd.wstart + sd.woff, ((0, padA), (0, 0)))
wcount = jnp.pad(sd.wcount, ((0, padA), (0, 0)))
tgtp = jnp.pad(tgt, ((0, padA), (0, 0), (0, 0)))
viscov = jnp.reshape(jnp.asarray(csp.visco, jnp.float32), (1,))
print(f"A={A} CA={CA} nchunk={nchunk}")

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
                      out_shape=jax.ShapeDtypeStruct((CA, T, CO), jnp.float32))

@jax.jit
def pure(tc, ws, wc, vv, tg, sfa):
    return call(tc, ws, wc, vv, tg, sfa)

args = (tcount[:CA], wstart[:CA].reshape(-1), wcount[:CA].reshape(-1),
        viscov, tgtp[:CA], sf)
tk, out = timeit(pure, *args)
print(f"pure pallas call ({CA} of {A} blocks): {tk:.2f} ms")

flat = out.reshape(CA * T, CO)

@jax.jit
def glue_back(flat, rsd):
    return jnp.take(flat, jnp.minimum(rsd.srow, CA * T - 1), axis=0)

tb, _ = timeit(glue_back, flat, sd)
print(f"glue back: {tb:.2f} ms")

# candidate stats
wc_np = np.asarray(sd.wcount); wo_np = np.asarray(sd.woff)
tc_np = np.asarray(sd.tcount)
act = tc_np > 0
nch = np.ceil((wo_np + wc_np) / CF.CW).astype(int)
print(f"blocks active={act.sum()}  mean tcount={tc_np[act].mean():.1f}")
print(f"mean window content lanes={wc_np[act].mean():.0f}  mean chunks/row={nch[act].mean():.2f}")
print(f"total chunk-bodies={nch[act].sum()}  pair-lanes={nch[act].sum()*T*CF.CW/1e9:.2f} G")
