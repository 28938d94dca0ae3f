"""A/B the rows-path interaction kernel under env-knob configs.

Builds the bench dam break once, then for each config (env overrides) builds
the divide + times ONLY the jitted interaction (the phase that is ~100% of
the step per PROFILE_r04).  Usage:
    python abkern.py [np] KEY=V[,KEY=V...] [KEY=V...] ...
Each positional group after np is one config; 'base' = defaults.
"""
import json
import os
import sys
import time

import jax
from dualsphysics_multilayer_tpu.utils.compilecache import enable_cache
enable_cache()
import jax.numpy as jnp

from dualsphysics_multilayer_tpu.models import cases
from dualsphysics_multilayer_tpu.models import wcsph as W
from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
from dualsphysics_multilayer_tpu import typesdef as td


def timeit(f, *a, n=20):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    args = sys.argv[1:]
    n_target = int(args.pop(0)) if args and args[0].isdigit() else 300_000
    cfgs = args or ["base"]
    dp = (0.11 / n_target) ** (1.0 / 3.0)
    case = cases.dambreak3d(dp=dp, obstacle=True)
    csp, dom, st0 = case.csp, case.dom, case.state
    opts = SolverOpts(tdensity=td.TpDensity.FOURTAKAS, use_pallas=True)

    base_env = {}
    for cfg in cfgs:
        # reset env to base, apply overrides
        for k, v in list(base_env.items()):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        over = {}
        if cfg != "base":
            for kv in cfg.split(","):
                k, v = kv.split("=")
                over[k] = v
        for k, v in over.items():
            if k not in base_env:
                base_env[k] = os.environ.get(k)
            os.environ[k] = v

        from dualsphysics_multilayer_tpu.ops.pallas import cellforce as CF
        print(json.dumps({"cfg": cfg,
                          "fast": CF.use_fast_body(csp, opts),
                          "roll": CF.use_roll(),
                          "mode": CF.kernel_mode()}), flush=True)
        carry = W.make_carry(st0, csp, opts, dom=dom)
        rd = carry.rdiv
        st = carry.st

        kern = jax.jit(lambda rd_, p, v, r, c: CF.interaction_forces_rows(
            csp, opts, dom, rd_, p, v, r, c).ace)
        t_k, ace = timeit(kern, rd, st.pos, st.vel, st.rho, st.code)
        step = jax.jit(W.make_step(csp, opts, dom))
        t_s, _ = timeit(step, carry, n=10)
        asum = float(jnp.sum(jnp.abs(ace)))
        print(json.dumps({
            "cfg": cfg, "np": case.np_total,
            "ms_interaction": round(t_k, 2), "ms_step": round(t_s, 2),
            "psps": round(case.np_total / (t_s / 1e3)),
            "ace_abssum": round(asum, 1),
            "overflow": int(rd.overflow),
            "valid": not int(rd.overflow)}), flush=True)
        if int(rd.overflow):
            print(f"[abkern] INVALID cfg {cfg}: divide overflow — "
                  "groups dropped, timings not comparable", flush=True)


if __name__ == "__main__":
    main()
