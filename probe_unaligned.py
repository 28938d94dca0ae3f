"""Probe: Mosaic dynamic VMEM lane-slice alignment semantics + cost.

Q1: does `ref[:, pl.ds(off, 128)]` compile when `off` is an arbitrary traced
scalar (not a multiple of 128)?
Q2: what does the unaligned load cost vs an aligned one (per-chunk us)?

Decides whether kernel v3 can drop the NSHIFT shifted-copy machinery and
slice trimmed candidate windows straight out of a VMEM row buffer.
"""
import functools
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, W, CW = 16, 4096, 128
NITER = 512   # chunk loads per grid step


def kern(off_s, x_ref, o_ref, *, aligned):
    def body(i, acc):
        off = off_s[i]
        if aligned:
            off = pl.multiple_of((off // CW) * CW, CW)
        cw = x_ref[:, pl.ds(off, CW)]
        return acc + cw * 1.000001 + acc * cw
    o_ref[:] = jax.lax.fori_loop(0, NITER, body, jnp.zeros((C, CW),
                                                           jnp.float32))


def run(aligned, G=64):
    offs = jnp.asarray(np.random.randint(0, W - CW, size=(NITER,)), jnp.int32)
    x = jnp.asarray(np.random.randn(C, W), jnp.float32)
    f = pl.pallas_call(
        functools.partial(kern, aligned=aligned),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[pl.BlockSpec((C, W), lambda a, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((C, CW), lambda a, *_: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((C, CW), jnp.float32),
    )
    jf = jax.jit(lambda o, xx: f(o, xx))
    out = jf(offs, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = jf(offs, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    per_chunk_ns = dt / (G * NITER) * 1e9
    print(f"aligned={aligned}: {dt*1e3:.3f} ms total, "
          f"{per_chunk_ns:.1f} ns per (16,128) chunk load+2fma")
    return out


if __name__ == "__main__":
    try:
        run(aligned=True)
    except Exception as e:
        print("ALIGNED FAILED:", type(e).__name__, str(e)[:500])
        sys.exit(1)
    try:
        run(aligned=False)
    except Exception as e:
        print("UNALIGNED FAILED:", type(e).__name__, str(e)[:500])
