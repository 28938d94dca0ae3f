"""Measure XLA gather throughput on the chip: the feasibility test for a
dense Verlet-list candidate layout (VERDICT r2 item 1 'dense-by-construction').

Variants:
  rows   out[m, c] = packed[idx[m], c]      (row gather, C minor)
  lanes  out[c, m] = packed[c, idx[m]]      (lane gather)
  tiles  rows gather + reshape/transpose to (A, C, L) kernel tiles
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NP_ = 302848
C = 8
A = 18928          # T=16 blocks
L = 768
M = A * L

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, NP_, size=(M,), dtype=np.int32))
rows = jnp.asarray(rng.normal(size=(NP_, C)).astype(np.float32))
lanes = jnp.asarray(rng.normal(size=(C, NP_)).astype(np.float32))


def t(f, *a, n=20):
    o = f(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3


gb = M * C * 4 / 1e9

f_rows = jax.jit(lambda r, i: jnp.take(r, i, axis=0))
f_lanes = jax.jit(lambda p, i: jnp.take(p, i, axis=1))
f_tiles = jax.jit(lambda r, i: jnp.transpose(
    jnp.take(r, i, axis=0).reshape(A, L, C), (0, 2, 1)))
ms = t(f_rows, rows, idx)
print(f"rows  gather ({M} x {C}ch): {ms:.2f} ms  {gb/ms*1e3:.0f} GB/s")
ms = t(f_lanes, lanes, idx)
print(f"lanes gather ({M} x {C}ch): {ms:.2f} ms  {gb/ms*1e3:.0f} GB/s")
ms = t(f_tiles, rows, idx)
print(f"tiles gather+T ({A},{C},{L}): {ms:.2f} ms  {gb/ms*1e3:.0f} GB/s")

# sorted-ish indices (cache-friendly: candidate lists are mostly local)
idx2 = jnp.sort(idx.reshape(A, L), axis=1).reshape(-1)
ms = t(f_rows, rows, idx2)
print(f"rows gather sorted-local: {ms:.2f} ms  {gb/ms*1e3:.0f} GB/s")
