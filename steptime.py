import time, jax, jax.numpy as jnp, numpy as np, dataclasses
from dualsphysics_multilayer_tpu.models import cases
from dualsphysics_multilayer_tpu.ops import celldiv as cd
from dualsphysics_multilayer_tpu.ops.pallas import cellforce as CF
from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
from dualsphysics_multilayer_tpu import typesdef as td
from dualsphysics_multilayer_tpu.models import wcsph as W

case = cases.dambreak3d(dp=0.0072, obstacle=True)
csp, dom, st = case.csp, case.dom, case.state
print("np:", st.n)
opts = SolverOpts(tdensity=td.TpDensity.FOURTAKAS, use_pallas=True)
T, Wd = CF.tiles_for(dom)

def timeit(f, *a, n=10):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3, out

div_j = jax.jit(lambda pos, code: cd.divide_sorted(
    dom, pos, code, tile_t=T, tile_w=Wd, group_sx=CF.GROUP_SX,
    maxgroups=CF.maxgroups_for(dom, st.n)))
tdiv, (sd, code) = timeit(div_j, st.pos, st.code)
print(f"divide_sorted: {tdiv:.2f} ms")

perm = sd.order
pos = st.pos[perm]; vel = st.vel[perm]; rho = st.rho[perm]; code2 = code[perm]
sd2 = dataclasses.replace(sd, order=jnp.arange(st.n, dtype=jnp.int32))

kern_j = jax.jit(lambda p, v, r, c: CF.interaction_forces_pallas(
    csp, opts, dom, sd2, p, v, r, c, state_sorted=True).ace)
tk, _ = timeit(kern_j, pos, vel, rho, code2)
print(f"kernel+glue: {tk:.2f} ms")

step = W.make_step(csp, opts, dom)
carry = W.make_carry(st, csp, opts)
stepj = jax.jit(step)
ts, carry2 = timeit(stepj, carry)
print(f"full step: {ts:.2f} ms  (2*kern+div = {2*tk+tdiv:.2f})")
