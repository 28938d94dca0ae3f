"""Benchmark: particle-steps/sec on the BASELINE.json config matrix.

Runs the full device-resident step loop and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "particle-steps/s", "vs_baseline": N}

Config selection (BENCH_CASE env; default ``dambreak3d`` — the headline
number the driver records):
  dambreak3d   3D dam break with obstacle, fused Pallas path
  waveflume    2D wave flume, piston wavemaker + AWAS absorption
  floatingbox  floating box, mDBC boundaries + 6-DOF rigid solve
  nnmud        non-Newtonian mud dam break (HBP multiphase, SPH gradients)
Other knobs: BENCH_NP (target particle count), BENCH_STEPS (steps per
device call).

vs_baseline is measured against BASELINE.json's 1e9 particle-steps/s target
for a v5e-8 (scaled to the device count actually available).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from dualsphysics_multilayer_tpu.utils.compilecache import enable_cache
enable_cache()


def _build(case_name, n_target):
    from dualsphysics_multilayer_tpu.models import cases
    from dualsphysics_multilayer_tpu.models.wcsph import make_carry, make_step
    from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
    from dualsphysics_multilayer_tpu.typesdef import (TpBoundary, TpDensity,
                                                      TpSlipMode)
    on_tpu = jax.default_backend() != "cpu"

    if case_name == "dambreak3d":
        # pick dp to hit ~n_target particles in the reference dam-break
        # geometry (fluid 0.4x0.67x0.3 + tank walls): n_fluid ~ 0.0804/dp^3
        dp = (0.11 / n_target) ** (1.0 / 3.0)
        case = cases.dambreak3d(dp=dp, obstacle=True)
        # BENCH_STEP=verlet runs the reference's -verlet integrator (one
        # interaction/step instead of symplectic's two) as a SECONDARY
        # metric; the headline/driver config stays symplectic (the
        # reference default)
        from dualsphysics_multilayer_tpu.typesdef import TpStep
        tstep = (TpStep.VERLET if os.environ.get("BENCH_STEP") == "verlet"
                 else TpStep.SYMPLECTIC)
        opts = SolverOpts(tdensity=TpDensity.FOURTAKAS, use_pallas=on_tpu,
                          tstep=tstep)
        step = make_step(case.csp, opts, case.dom)
        carry = make_carry(case.state, case.csp, opts, dom=case.dom)
        return case, step, carry

    if case_name == "waveflume":
        dp = (6.0 * 0.4 / n_target) ** 0.5
        case = cases.waveflume2d(dp=dp)
        feats = case.meta.get("features")
        if feats is None:
            from dualsphysics_multilayer_tpu.features.featureset import Features
            feats = Features(motions=(case.meta["motion"],)
                             if "motion" in case.meta else ())
        opts = SolverOpts(tdensity=TpDensity.FOURTAKAS, use_pallas=on_tpu)
        step = make_step(case.csp, opts, case.dom, feats)
        carry = make_carry(case.state, case.csp, opts, feats, dom=case.dom)
        return case, step, carry

    if case_name == "floatingbox":
        dp = (2.0 * 0.5 / n_target) ** 0.5
        case = cases.floatingbox2d(dp=dp)
        from dualsphysics_multilayer_tpu.features.featureset import Features
        feats = Features(floating=case.meta["ftcfg"])
        opts = SolverOpts(tdensity=TpDensity.FOURTAKAS, with_floating=True,
                          tboundary=TpBoundary.MDBC,
                          slipmode=TpSlipMode.NO_SLIP, use_pallas=on_tpu)
        step = make_step(case.csp, opts, case.dom, feats)
        carry = make_carry(case.state, case.csp, opts, feats, dom=case.dom)
        return case, step, carry

    if case_name == "nnmud":
        from dualsphysics_multilayer_tpu.models import nnewtonian as NNM
        from dualsphysics_multilayer_tpu.typesdef import TpVisco
        dp = (2.0 * 0.45 * 0.35 / n_target) ** 0.5 * 1.4
        case, phases = NNM.wet_dambreak_nn(dp=max(dp, 0.0025))
        opts = SolverOpts(tvisco=TpVisco.LAMINAR_SPS,
                          tdensity=TpDensity.FOURTAKAS, use_pallas=on_tpu)
        step = NNM.make_nn_step(case.csp, opts, case.dom, phases)
        carry = make_carry(case.state, case.csp, opts, dom=case.dom,
                           use_rowdiv=NNM.nn_rowdiv_ok(case.csp, opts,
                                                       case.dom))
        return case, step, carry

    raise SystemExit(f"unknown BENCH_CASE {case_name!r}")


def main():
    case_name = os.environ.get("BENCH_CASE", "dambreak3d")
    n_default = 300_000 if case_name == "dambreak3d" else 60_000
    n_target = int(os.environ.get("BENCH_NP", n_default))
    case, step, carry = _build(case_name, n_target)
    n = case.np_total

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
    label = {"dambreak3d": "3D dam break",
             "waveflume": "2D wave flume piston+AWAS",
             "floatingbox": "floating box mDBC",
             "nnmud": "NN mud dam break"}[case_name]
    if os.environ.get("BENCH_STEP") == "verlet":
        label += " (Verlet)"
    out = {
        "metric": f"particle-steps/s ({label}, {n} particles, "
                  f"{ndev} chip(s))",
        "value": round(psps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(psps / target, 4),
        "p50_step_ms": round(p50 * 1e3, 3),
        "np": n,
        "nstep": int(carry.nstep),
        "overflow": int(carry.overflow),
    }
    if int(carry.overflow):
        # A divide overflow means groups were silently DROPPED from the
        # interaction — any timing measured through that state is invalid
        # (PROFILE_r04.md documents exactly this contaminating an A/B).
        # Mark the result, skip the README regen, and fail the run.
        out["valid"] = False
        print(json.dumps(out))
        print(f"[bench] INVALID: divide overflow={int(carry.overflow)} — "
              "groups dropped, timings not comparable", file=sys.stderr)
        sys.exit(1)
    print(json.dumps(out))
    try:
        _update_readme(label, out)
    except Exception as e:          # table refresh must never fail the bench
        print(f"[bench] README update skipped: {e}", file=sys.stderr)


def _update_readme(label, out):
    """Regenerate this config's row of README.md's perf table (between the
    BENCH_TABLE markers) so the published numbers always match the last
    measured run."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "README.md")
    text = open(path).read()
    start = text.index("<!-- BENCH_TABLE_START -->")
    end = text.index("<!-- BENCH_TABLE_END -->")
    block = text[start:end].splitlines()
    npk = (f"{out['np'] / 1e6:.1f}M" if out["np"] >= 1e6
           else f"{round(out['np'] / 1e3)}k")
    row = (f"| {label} | {npk} | **{out['value'] / 1e6:.1f}M** | "
           f"{out['p50_step_ms']:.1f} ms |")
    kept = [ln for ln in block
            if not ln.startswith(f"| {label} | {npk} ")]
    kept.append(row)
    text = text[:start] + "\n".join(kept) + "\n" + text[end:]
    open(path, "w").write(text)


if __name__ == "__main__":
    main()
