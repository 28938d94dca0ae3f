"""Named phase timers + step profiler.

The reference wraps every stage in named timers (`JDsTimers`, CPU ontology
`JDsTimersCpu.h:28-85`: NL-Limits/MakeSort/SortData, CF-PreForces/Forces,
SU-ComputeStep/Floating/Motion/...) and prints a table at the end
(`ShowTimes`).  Under XLA the production step is ONE fused device program, so
per-phase wall timing is obtained by a dedicated profiling mode that runs the
phases as separate device calls (the jit-vs-phases analog of `-svtimers`).
"""

from __future__ import annotations

import time
from collections import defaultdict

import jax
import jax.numpy as jnp


class Timers:
    """Named accumulating wall timers (TmStart/TmStop/ShowTimes analog)."""

    def __init__(self):
        self.acc = defaultdict(float)
        self.counts = defaultdict(int)
        self._t0 = {}

    def start(self, name):
        self._t0[name] = time.perf_counter()

    def stop(self, name):
        dt = time.perf_counter() - self._t0.pop(name)
        self.acc[name] += dt
        self.counts[name] += 1
        return dt

    def table(self):
        total = sum(self.acc.values()) or 1.0
        rows = [f"{'Timer':<24}{'calls':>8}{'total_s':>12}{'%':>8}"]
        for k in sorted(self.acc, key=lambda k: -self.acc[k]):
            rows.append(f"{k:<24}{self.counts[k]:>8}{self.acc[k]:>12.4f}"
                        f"{100 * self.acc[k] / total:>8.1f}")
        return "\n".join(rows)


def profile_step(csp, opts, dom, state, reps=10):
    """Per-phase device timings for one configuration (chained calls so the
    tunnel RTT amortizes).  Returns {phase: seconds}."""
    from ..ops import celldiv as cd
    from ..ops import eos
    from ..ops import forces as F
    from ..models.wcsph import make_carry, make_step

    out = {}

    def timeit(fn, *args):
        o = fn(*args)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(*args)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / reps

    if opts.use_pallas:
        from ..ops.pallas import cellforce as CF
        T, W = CF.tiles_for(dom)
        dv = jax.jit(lambda p, c: cd.divide_sorted(dom, p, c, tile_t=T,
                                                   tile_w=W))
        sd, code = dv(state.pos, state.code)
        out["NL-DivideSorted"] = timeit(dv, state.pos, state.code)
        ff = jax.jit(lambda s, p, v, r, c: CF.interaction_forces_pallas(
            csp, opts, dom, s, p, v, r, c))
        out["CF-ForcesPallas"] = timeit(ff, sd, state.pos, state.vel,
                                        state.rho, state.code)
    else:
        dv = jax.jit(lambda p, c: cd.divide(dom, p, c))
        div, code = dv(state.pos, state.code)
        out["NL-Divide"] = timeit(dv, state.pos, state.code)
        press = eos.press_from_rho(csp, state.rho)
        ff = jax.jit(lambda d, p, v, r, pr, c: F.interaction_forces(
            csp, opts, d, p, v, r, pr, c, spstau=state.spstau))
        out["CF-Forces"] = timeit(ff, div, state.pos, state.vel, state.rho,
                                  press, state.code)

    step = make_step(csp, opts, dom)
    carry = make_carry(state, csp, opts)
    K = max(reps, 5)
    runk = jax.jit(lambda c: jax.lax.fori_loop(0, K, lambda i, cc: step(cc), c))
    carry = runk(carry)
    jax.block_until_ready(carry.st.pos)
    t0 = time.perf_counter()
    carry = runk(carry)
    jax.block_until_ready(carry.st.pos)
    out["SU-FullStep"] = (time.perf_counter() - t0) / K
    return out
