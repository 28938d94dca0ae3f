import time, jax, jax.numpy as jnp, numpy as np
from dualsphysics_multilayer_tpu.models import cases
from dualsphysics_multilayer_tpu.models.wcsph import make_carry, make_step
from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
from dualsphysics_multilayer_tpu.features.featureset import Features
from dualsphysics_multilayer_tpu.typesdef import TpBoundary, TpDensity, TpSlipMode

dp = (2.0*0.5/60000)**0.5
case = cases.floatingbox2d(dp=dp)
feats = Features(floating=case.meta["ftcfg"])
res = {}
for name, up in {"mdbc(jnp)": False, "mdbc(pallas)": True}.items():
    opts = SolverOpts(tdensity=TpDensity.FOURTAKAS, with_floating=True,
                      tboundary=TpBoundary.MDBC, slipmode=TpSlipMode.NO_SLIP,
                      use_pallas=up)
    step = make_step(case.csp, opts, case.dom, feats)
    carry = make_carry(case.state, case.csp, opts, feats)
    stepj = jax.jit(step)
    c = stepj(carry); jax.block_until_ready(c.st.pos)
    t0=time.time()
    for _ in range(10): c = stepj(c)
    jax.block_until_ready(c.st.pos)
    print(f"{name}: {(time.time()-t0)/10*1e3:.2f} ms/step  overflow={int(c.overflow)}")
    res[name] = c
# physics agreement after 11 steps
a, b = res["mdbc(jnp)"], res["mdbc(pallas)"]
print("center diff:", float(jnp.abs(a.st.ft.center - b.st.ft.center).max()),
      " dt diff:", abs(float(a.dt_pre) - float(b.dt_pre)))
