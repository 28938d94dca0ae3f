"""PIPS — particle-pair interactions per second (the reference's headline
throughput metric, `JDsPips.h:50-80`, CLI `-svpips`).

Counts *real* pair interactions (rr2 <= KernelSize^2) and *checked* candidate
lanes per step from the live state, and turns a measured step time into
PIPS/GPIs plus the checked/real neighbour-search efficiency ratio."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import typesdef as td
from ..ops import celldiv as cd


def count_pairs(csp, dom, state):
    """Returns (real_pairs, checked_lanes) for the current state — the
    JDsPips::ComputeCpu counting pass."""
    div, code = cd.divide(dom, state.pos, state.code)
    n = state.pos.shape[0]
    pos_b = cd.gather(state.pos, div.bucket_idx)
    valid_b = div.bucket_idx < n
    A = div.bucket_idx.shape[0] - 1
    ks2 = csp.kernelsize2
    real = jnp.zeros((), jnp.int64)
    checked = jnp.zeros((), jnp.int64)
    t = slice(0, A)
    for o in range(div.neigh_slot.shape[1]):
        cslot = div.neigh_slot[:, o]
        dr = pos_b[t][:, :, None, :] - pos_b[cslot][:, None, :, :]
        rr2 = jnp.sum(dr * dr, axis=-1)
        both = valid_b[t][:, :, None] & valid_b[cslot][:, None, :]
        real = real + jnp.sum((both & (rr2 <= ks2)
                               & (rr2 >= td.ALMOSTZERO)).astype(jnp.int64))
        checked = checked + jnp.sum(both.astype(jnp.int64))
    return int(real), int(checked)


def pips_report(csp, dom, state, step_seconds, interactions_per_step=2):
    """One JDsPips-style report line."""
    real, checked = count_pairs(csp, dom, state)
    pis = real * interactions_per_step / step_seconds
    return dict(
        real_pairs=real,
        checked_pairs=checked,
        check_ratio=checked / max(real, 1),
        pips=pis,
        gpips=pis / 1e9,
    )
