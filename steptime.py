"""Per-step timing breakdown on the real TPU: divide, kernel, full step."""
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
T, Wd = CF.tiles_rows(dom)


def timeit(f, *a, n=10):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3, out


carry = W.make_carry(st, csp, opts, dom=dom)
print("NP:", carry.st.n, "nactive:", int(carry.rdiv.nactive),
      "overflow:", int(carry.rdiv.overflow))

reb_j = jax.jit(lambda s: W._rowdiv_rebuild(csp, dom, s))
treb, _ = timeit(reb_j, carry.st)
print(f"rowdiv rebuild (divide+permute): {treb:.2f} ms")

kern_j = jax.jit(lambda rd, p, v, r, c: CF.interaction_forces_rows(
    csp, opts, dom, rd, p, v, r, c).ace)
tk, _ = timeit(kern_j, carry.rdiv, carry.st.pos, carry.st.vel, carry.st.rho,
               carry.st.code)
print(f"rows kernel+glue: {tk:.2f} ms")

step = W.make_step(csp, opts, dom)
stepj = jax.jit(step)
ts, carry2 = timeit(stepj, carry)
print(f"full step: {ts:.2f} ms  (2*kern = {2*tk:.2f})")

# chained steps (bench-style): amortization shows up here
K = 50
runk = jax.jit(lambda c: jax.lax.fori_loop(0, K, lambda i, cc: stepj(cc), c))
c3 = runk(carry); jax.block_until_ready(c3.st.pos)
t0 = time.time()
c4 = runk(c3); jax.block_until_ready(c4.st.pos)
dt = (time.time() - t0) / K * 1e3
print(f"chained step: {dt:.2f} ms  nrebuild={int(c4.nrebuild)}/{int(c4.nstep)} "
      f"overflow={int(c4.overflow)}  psps={st.n/dt*1e3/1e6:.2f}M")

