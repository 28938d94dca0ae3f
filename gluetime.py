import time, jax, jax.numpy as jnp, numpy as np, dataclasses
from dualsphysics_multilayer_tpu.models import cases
from dualsphysics_multilayer_tpu.ops import celldiv as cd
from dualsphysics_multilayer_tpu.ops.pallas import cellforce as CF
from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
from dualsphysics_multilayer_tpu import typesdef as td

case = cases.dambreak3d(dp=0.0072, obstacle=True)
csp, dom, st = case.csp, case.dom, case.state
opts = SolverOpts(tdensity=td.TpDensity.FOURTAKAS, use_pallas=True)
T, Wd = CF.tiles_for(dom)
sd, code = cd.divide_sorted(dom, st.pos, st.code, tile_t=T, tile_w=Wd,
                            group_sx=CF.GROUP_SX,
                            maxgroups=CF.maxgroups_for(dom, st.n))
perm = sd.order
pos = st.pos[perm]; vel = st.vel[perm]; rho = st.rho[perm]; code2 = code[perm]
sd2 = dataclasses.replace(sd, order=jnp.arange(st.n, dtype=jnp.int32))
n = sd2.ncap

def timeit(f, *a, n_=10):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n_ * 1e3

@jax.jit
def glue_front(pos, vel, rho, code):
    ikind = td.code_type(code)
    kind = ikind.astype(jnp.float32)
    press = CF._press(csp, rho)
    mass = jnp.where(ikind >= td.TYPE_FLUID, csp.massfluid,
                     csp.massbound).astype(jnp.float32)
    packed = jnp.stack(
        [pos[:, 0], pos[:, 1], pos[:, 2], vel[:, 0], vel[:, 1], vel[:, 2],
         rho, press, 1.0 / rho, kind, mass], axis=0)
    packed = jnp.pad(packed, ((0, CF.C - packed.shape[0]), (0, 0)))
    sf = jnp.pad(packed, ((0, 0), (0, Wd)))
    tidx = sd2.tstart[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    tidx = jnp.minimum(tidx, n - 1 + Wd)
    tgt = jnp.transpose(sf, (1, 0))[tidx]
    return sf, tgt

print(f"glue front (pack+tgt): {timeit(glue_front, pos, vel, rho, code2):.2f} ms")

A = sd2.tstart.shape[0]
flat = jnp.zeros((A * T, CF.CO), jnp.float32)

@jax.jit
def glue_back(flat):
    sorted_out = jnp.take(flat, sd2.srow, axis=0, mode="fill",
                          fill_value=np.float32(0.0))
    return sorted_out

print(f"glue back (srow take): {timeit(glue_back, flat):.2f} ms")
