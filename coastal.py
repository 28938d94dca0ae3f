"""BASELINE config 5: 3-D coastal runup, composed sharded + single-chip.

Two modes (CR_MODE env):
  mesh  (default)  build coastal_runup3d at CR_NP particles, shard it over
                   an 8-virtual-device CPU mesh, run CR_STEPS steps, check
                   overflow==0 and report per-shard balance.  Validates the
                   10-50M decomposition path without TPU hardware.
  tpu              single-chip slice on the real TPU at CR_NP particles:
                   timed steps through the fused kernel (the per-chip
                   building block of the v5e-8 target).

Writes COASTAL_r05.json next to the repo root with the measured numbers.
"""
import json
import sys
sys.path.insert(0, __file__.rsplit('/',1)[0])
from dualsphysics_multilayer_tpu.utils.compilecache import enable_cache
enable_cache()
import os
import sys
import time


def main():
    mode = os.environ.get("CR_MODE", "mesh")
    out = {"mode": mode}
    if mode == "mesh":
        n_target = int(os.environ.get("CR_NP", 200_000))
        nsteps = int(os.environ.get("CR_STEPS", 5))
        ndev = 8
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={ndev}"
            ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        n_target = int(os.environ.get("CR_NP", 2_000_000))
        nsteps = int(os.environ.get("CR_STEPS", 10))
        import jax

    import jax.numpy as jnp
    import numpy as np
    from dualsphysics_multilayer_tpu.models import cases
    from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
    from dualsphysics_multilayer_tpu.typesdef import TpDensity

    # pick dp for the target count: fluid volume ~ depth*width*length minus
    # the beach wedge; particles ~ V/dp^3
    L, W_, D, S0, SL = 8.0, 2.0, 0.5, 3.0, 0.1
    wedge = 0.5 * max(0.0, (L - S0)) ** 2 * SL * W_
    vol = L * W_ * D - min(wedge, L * W_ * D * 0.5)
    dp = (vol / n_target) ** (1.0 / 3.0)
    t0 = time.time()
    case = cases.coastal_runup3d(dp=dp, length=L, width=W_, depth=D,
                                 slope_start=S0, slope=SL, wave_height=0.12)
    out["np"] = case.np_total
    out["dp"] = round(dp, 5)
    out["nc"] = list(case.dom.nc)
    out["t_build_s"] = round(time.time() - t0, 1)
    print(json.dumps({"built": out}), flush=True)

    opts = SolverOpts(tdensity=TpDensity.FOURTAKAS,
                      use_pallas=jax.default_backend() != "cpu")
    if mode == "mesh":
        # the CPU bucket path's (cells, K, K) pair temporaries are only
        # auto-chunked above 64k cells PER SHARD — an 8-shard 266k mesh run
        # measured 130 GB RSS and an oom-kill without this bound
        import dataclasses
        opts = dataclasses.replace(
            opts, cell_chunk=int(os.environ.get("CR_CHUNK", "2048")))
    if mode == "mesh":
        from jax.sharding import Mesh
        from dualsphysics_multilayer_tpu.models.wcsph import make_carry
        from dualsphysics_multilayer_tpu.parallel import sharding as S

        mesh = Mesh(np.array(jax.devices()[:ndev]), (S.AXIS,))
        # per-shard capacity: balanced slab load + migration slack
        # (CR_SLACK; 10M+ on a 125 GB host needs the lean setting)
        slack = float(os.environ.get("CR_SLACK", "2.2"))
        n_local = int(case.np_total // ndev * slack) + 4096
        cfg = S.make_shard_cfg(case.dom, ndev, n_local)
        st = S.shard_state(cfg, case.state)
        carry = make_carry(st, case.csp, opts)
        adv = S.make_sharded_advance(cfg, case.csp, opts, mesh)
        t1 = time.time()
        carry = adv(carry, jnp.asarray(1e9, jnp.float32),
                    jnp.asarray(nsteps, jnp.int32))
        jax.block_until_ready(carry.st.pos)
        out["t_steps_s"] = round(time.time() - t1, 1)
        out["nstep"] = int(carry.nstep)
        out["overflow"] = int(carry.overflow)
        out["dt"] = float(carry.dt_pre)
        # per-shard live balance
        code = np.asarray(carry.st.code).reshape(ndev, -1)
        import dualsphysics_multilayer_tpu.typesdef as td
        live = ((code >> td.CODE_SPECIAL_SHIFT) & td.CODE_SPECIAL_MASK) \
            < td.SPECIAL_OUT_POS
        out["shard_live"] = live.sum(axis=1).tolist()
        assert out["overflow"] == 0, out
        assert out["nstep"] == nsteps
    else:
        from dualsphysics_multilayer_tpu.models.wcsph import (make_carry,
                                                              make_step)
        step = make_step(case.csp, opts, case.dom)
        carry = make_carry(case.state, case.csp, opts, dom=case.dom)
        runk = jax.jit(lambda c: jax.lax.fori_loop(
            0, nsteps, lambda i, cc: step(cc), c))
        t1 = time.time()
        carry = runk(carry)
        jax.block_until_ready(carry.st.pos)
        out["t_first_call_s"] = round(time.time() - t1, 1)
        t2 = time.time()
        carry = runk(carry)
        jax.block_until_ready(carry.st.pos)
        dtw = (time.time() - t2) / nsteps
        out["p50_step_ms"] = round(dtw * 1e3, 2)
        out["psps"] = round(case.np_total / dtw)
        out["overflow"] = int(carry.overflow)
        assert out["overflow"] == 0, out

    print(json.dumps(out), flush=True)
    tag = "mesh" if mode == "mesh" else "tpu"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "COASTAL_r05.json")
    prev = {}
    if os.path.exists(path):
        try:
            prev = json.load(open(path))
        except Exception:
            prev = {}
    prev[tag] = out
    json.dump(prev, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
