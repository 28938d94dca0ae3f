"""Benchmark: particle-steps/sec on a 3D dam break (BASELINE.json metric).

Runs the full symplectic WCSPH step loop (2 cell divides + 2 fused force
interactions + dt reductions per step, all device-resident) on the biggest 3D
dam break that fits comfortably, and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "particle-steps/s", "vs_baseline": N}

vs_baseline is measured against BASELINE.json's 1e9 particle-steps/s target
for a v5e-8 (scaled to the device count actually available).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    n_target = int(os.environ.get("BENCH_NP", 300_000))
    from dualsphysics_multilayer_tpu.models import cases
    from dualsphysics_multilayer_tpu.models.wcsph import make_carry, make_step
    from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
    from dualsphysics_multilayer_tpu.typesdef import TpDensity

    # pick dp to hit ~n_target particles in the reference dam-break geometry
    # (fluid 0.4x0.67x0.3 + tank walls): n_fluid ~ 0.0804/dp^3
    dp = (0.11 / n_target) ** (1.0 / 3.0)
    case = cases.dambreak3d(dp=dp, obstacle=True)
    n = case.np_total
    csp, dom = case.csp, case.dom

    opts = SolverOpts(tdensity=TpDensity.FOURTAKAS,
                      use_pallas=jax.default_backend() != "cpu")
    step = make_step(csp, opts, dom)
    carry = make_carry(case.state, csp, opts)

    # measure K steps chained on device (like the production while_loop —
    # per-step host sync would measure tunnel RTT, not the solver)
    K = int(os.environ.get("BENCH_STEPS", 25))
    runk = jax.jit(lambda c: jax.lax.fori_loop(0, K, lambda i, cc: step(cc), c))
    carry = runk(carry)
    jax.block_until_ready(carry.st.pos)

    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = runk(carry)
        jax.block_until_ready(carry.st.pos)
        times.append((time.perf_counter() - t0) / K)
    times.sort()
    p50 = times[len(times) // 2]
    psps = n / p50

    ndev = len(jax.devices())
    target = 1e9 * ndev / 8.0   # BASELINE target is for v5e-8
    out = {
        "metric": f"particle-steps/s (3D dam break, {n} particles, "
                  f"{ndev} chip(s))",
        "value": round(psps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(psps / target, 4),
        "p50_step_ms": round(p50 * 1e3, 3),
        "np": n,
        "nstep": int(carry.nstep),
        "overflow": int(carry.overflow),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
