import time, jax, jax.numpy as jnp, numpy as np
from dualsphysics_multilayer_tpu.models import cases
from dualsphysics_multilayer_tpu.ops import celldiv as cd
from dualsphysics_multilayer_tpu.ops.pallas import cellforce as CF
from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
from dualsphysics_multilayer_tpu.ops import eos
from dualsphysics_multilayer_tpu import typesdef as td

case = cases.dambreak3d(dp=0.0085)
csp, dom, st = case.csp, case.dom, case.state
opts = SolverOpts(tdensity=td.TpDensity.FOURTAKAS, use_pallas=True)
T, W = CF.tiles_for(dom)
sd, code = cd.divide_sorted(dom, st.pos, st.code, tile_t=T, tile_w=W,
                            group_sx=CF.GROUP_SX,
                            maxgroups=CF.maxgroups_for(dom, st.n))
perm = sd.order
pos = st.pos[perm]; vel = st.vel[perm]; rho = st.rho[perm]; code2 = code[perm]
import dataclasses
sd2 = dataclasses.replace(sd, order=jnp.arange(st.n, dtype=jnp.int32))

@jax.jit
def run(pos, vel, rho, code):
    fr = CF.interaction_forces_pallas(csp, opts, dom, sd2, pos, vel, rho,
                                      code, state_sorted=True)
    return fr.ace, fr.ar, fr.viscdtmax

out = run(pos, vel, rho, code2); jax.block_until_ready(out)
t0 = time.time()
N = 20
for _ in range(N):
    out = run(pos, vel, rho, code2)
jax.block_until_ready(out)
dt = (time.time() - t0) / N
print(f"kernel+glue: {dt*1e3:.2f} ms  ace[1000]={np.asarray(out[0])[1000]}")
