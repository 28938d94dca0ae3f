"""VPU issue-rate microbenchmark: measure f32 vreg-ops/cycle on (32,128)
tiles as a function of ILP (independent dependency chains) and op mix.

Answers: is the pair body's measured ~2 vreg-ops/cycle the hardware peak,
or a scheduling artifact with dual-issue headroom?  (PROFILE_r05)"""
import time
import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 32, 128
REP = 50000         # inner fori iterations
OPS = 64            # fma ops per iteration (spread over CHAINS chains)


def make_kernel(chains, op="fma", rep=REP, ops=OPS):
    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def body(i, accs):
            accs = list(accs)
            f = i.astype(jnp.float32) * 1e-9
            for j in range(ops):
                c = j % chains
                if op == "fma":
                    # alternate fma/max so no algebraic folding is possible
                    if j % 2:
                        accs[c] = jnp.maximum(accs[c], x * f - accs[c])
                    else:
                        accs[c] = accs[c] * (1.0 + f) + x
                elif op == "mix":
                    # pair-body-like mix: fma, max, mul, compare
                    k = j % 4
                    if k == 0:
                        accs[c] = accs[c] * (1.0 + f) + x
                    elif k == 1:
                        accs[c] = jnp.maximum(accs[c], x - f)
                    elif k == 2:
                        accs[c] = accs[c] * (x + f)
                    else:
                        accs[c] = accs[c] + (accs[c] > f).astype(jnp.float32)
                elif op == "rsqrt":
                    accs[c] = jax.lax.rsqrt(jnp.abs(accs[c]) + x + f)
                elif op == "recip":
                    accs[c] = pl.reciprocal(jnp.abs(accs[c]) + x + f,
                                            approx=True)
            return tuple(accs)

        accs = tuple(x + j for j in range(chains))
        accs = jax.lax.fori_loop(0, rep, body, accs)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("chains", "op"))
def run(x, chains, op):
    return pl.pallas_call(
        make_kernel(chains, op),
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def main():
    x = jnp.full((SUB, LANE), 1e-6, jnp.float32)
    print(f"tile ({SUB},{LANE}) = {SUB // 8} vregs; {REP} iters x {OPS} ops")
    freq = 0.94e9   # v5e clock
    for op in ("fma", "mix", "rsqrt", "recip"):
        for chains in (1, 2, 4, 8):
            r = run(x, chains, op)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            N = 20
            for _ in range(N):
                r = run(x, chains, op)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / N
            vregs = REP * OPS * (SUB // 8)
            per_cycle = vregs / (dt * freq)
            print(f"op={op:6s} chains={chains}  {dt * 1e3:7.3f} ms  "
                  f"{per_cycle:5.2f} vreg-ops/cycle")


if __name__ == "__main__":
    main()
