"""A/B the unmeasured kernel knobs on real TPU in ONE run.

Usage (as soon as the TPU claim works):
    timeout 3600 python abtest.py            # full matrix
    AB_STEPS=30 AB_NP=267000 python abtest.py

Measures bench-style particle-steps/s for the knob matrix the round-2 CPU
work introduced but could not measure (TPU wedged, see memory notes):
  - DSPH_ROWDIV_MERGED  1 (merged windows, R 9->3) vs 0 (per-row)
  - DSPH_FINEX          4 (sub-cell window starts) vs 1 (off)
  - DSPH_KBLOCKS        1 vs 2 vs 4 (blocks per grid step)
Each config runs in a fresh subprocess (the knobs are read at import/trace
time).  Prints one JSON line per config + the winner.  Run SERIALLY —
concurrent TPU benches corrupt timings through the axon tunnel.
"""

import itertools
import json
import os
import subprocess
import sys

MATRIX = []
for merged, finex, kb in itertools.product((1, 0), (4, 1), (1, 2, 4)):
    MATRIX.append(dict(DSPH_ROWDIV_MERGED=str(merged),
                       DSPH_FINEX=str(finex),
                       DSPH_KBLOCKS=str(kb)))

CHILD = r"""
import json, os, time
import jax
from dualsphysics_multilayer_tpu.models import cases
from dualsphysics_multilayer_tpu.models.wcsph import make_carry, make_step
from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
from dualsphysics_multilayer_tpu.typesdef import TpDensity

n_target = int(os.environ.get("AB_NP", 267000))
dp = (0.11 / n_target) ** (1.0 / 3.0)
case = cases.dambreak3d(dp=dp, obstacle=True)
opts = SolverOpts(tdensity=TpDensity.FOURTAKAS, use_pallas=True)
step = make_step(case.csp, opts, case.dom)
carry = make_carry(case.state, case.csp, opts, dom=case.dom)
K = int(os.environ.get("AB_STEPS", 25))
runk = jax.jit(lambda c: jax.lax.fori_loop(0, K, lambda i, cc: step(cc), c))
carry = runk(carry); jax.block_until_ready(carry.st.pos)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    carry = runk(carry); jax.block_until_ready(carry.st.pos)
    times.append((time.perf_counter() - t0) / K)
times.sort()
print(json.dumps({"p50_ms": times[1] * 1e3,
                  "psps": case.np_total / times[1],
                  "np": case.np_total,
                  "overflow": int(carry.overflow),
                  "valid": not int(carry.overflow)}))
"""


def main():
    results = []
    for cfg in MATRIX:
        env = dict(os.environ, **cfg)
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True, timeout=1200)
        tag = " ".join(f"{k.split('_')[-1]}={v}" for k, v in cfg.items())
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            d = json.loads(line)
            d["cfg"] = tag
            results.append(d)
            print(json.dumps(d))
        except (ValueError, IndexError):
            print(json.dumps({"cfg": tag, "error": r.stderr[-300:]}))
    if results:
        best = max(results, key=lambda d: d["psps"])
        print(json.dumps({"winner": best["cfg"], "psps": best["psps"],
                          "p50_ms": best["p50_ms"]}))


if __name__ == "__main__":
    main()
