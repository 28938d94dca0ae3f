"""End-to-end verify: 3D dam break on TPU via the Simulation API (v3 kernel).

Observable: dam-front position vs Koshizuka & Oka 1996 (front/H at t*),
density within +-10%, overflow == 0.
"""
import numpy as np
import jax
import dualsphysics_multilayer_tpu as dsph
from dualsphysics_multilayer_tpu.models import cases
from dualsphysics_multilayer_tpu import typesdef as td

case = cases.dambreak3d(dp=0.012, obstacle=False)
print("np", case.np_total, "backend", jax.default_backend())
opts = dsph.SolverOpts(tdensity=dsph.TpDensity.FOURTAKAS, use_pallas=True)
sim = dsph.Simulation(case.csp, opts, case.dom, case.state)

H = 0.3   # initial fluid column height (dambreak3d geometry)
g = 9.81
rows = []


def on_save(s):
    pos = np.asarray(s.state.pos)
    code = np.asarray(s.state.code)
    fl = (np.asarray(td.code_type(code)) == td.TYPE_FLUID) \
        & np.asarray(td.is_active(code))
    rho = np.asarray(s.state.rho)[fl]
    front = pos[fl, 0].max()
    ts = s.time * np.sqrt(2 * g / H)
    rows.append((s.part, float(s.time), float(ts), float(front),
                 float(rho.min()), float(rho.max()),
                 int(s.carry.overflow)))
    print(f"part {s.part} t={s.time:.3f} t*={ts:.2f} front={front:.3f} "
          f"rho=[{rho.min():.0f},{rho.max():.0f}] "
          f"ovf={int(s.carry.overflow)}")


sim.run(tmax=0.20, tout=0.04, on_save=on_save)
front0 = 0.4   # initial column width
last = rows[-1]
adv = (last[3] - front0) / H
print(f"front advance/H at t*={last[2]:.2f}: {adv:.2f}")
ok = (last[6] == 0 and 900 < last[4] and last[5] < 1150
      and 0.5 < adv and last[2] > 1.0)
print("VERIFY", "OK" if ok else "FAIL")
