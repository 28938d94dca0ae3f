"""Pallas TPU kernel: fused WCSPH pair forces over sorted cell-row windows.

This is the speed-of-light path for the interaction that dominates runtime
(reference `InteractionForcesFluid`, ~90% of runtime per SURVEY §3.2; GPU twin
`KerInteractionForcesFluid`, `JSphGpu_ker.cu:654`).  The reference GPU kernel
walks 9 contiguous (y,z) particle ranges per target (`JCellSearch_iker.h`);
this kernel is the TPU-native equivalent:

* particles are pre-sorted by cell (divide_sorted); per active cell the
  kernel processes a (T x W) pair tile per neighbour row — T = cell targets
  (sublanes), W = the contiguous 3-cell candidate window (lanes);
* ALL memory movement is contiguous: the candidate window is one dynamic-
  slice DMA from the packed (C, n) sorted field matrix into VMEM — there are
  NO per-pair random gathers (XLA gathers are the reason the plain jnp
  layouts cap out ~100x below hardware limits on TPU);
* the whole pair physics (Wendland gradient, pressure, continuity, DDT,
  artificial viscosity, per-target viscdt max) is fused in registers; one
  (A, T, Co) output tile per cell, combined outside.

Precision notes: pair math is f32 like the reference GPU path
(`JSphGpu_ker.cu:525-528` does pair math in f32 via PosCell); the Fourtakas
DDT's pow(1+x, 1/gamma) is evaluated by a 3-term Taylor series — x =
ddtgz*dz <= gamma*g*kernelsize/cs0^2 is O(1e-3) for any WCSPH-valid setup, so
the truncation error is O(1e-12), far below f32 resolution.

Supported (v1): Wendland kernel, artificial viscosity, DDT none/Molteni/
Fourtakas(/full), DBC, no floating bodies, no shifting, no SPS.  Callers fall
back to the jnp bucket path (ops.forces) for other configs.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import typesdef as td
from ...typesdef import CteSph, TpBoundary, TpDensity, TpKernel, TpVisco
from .. import celldiv as cd
from ..forces import Forces, SolverOpts

# packed field channels: pos, vel, rho, press, 1/rho, kind.  press and
# 1/rho are precomputed on the XLA side (one fused elementwise pass over n)
# so the kernel's inner chunk loop spends no ops on the Tait EOS or the
# rho reciprocal per candidate lane.
(_CX, _CY, _CZ, _CVX, _CVY, _CVZ, _CRHO, _CPRESS, _CINVRHO, _CKIND,
 _CMASS) = range(11)
_CTAU = 11          # 6 SPS stress channels (laminar+SPS mode only)


def c_for(opts) -> int:
    """Packed-field channels, padded to the f32 sublane tile (8): 16 for
    the 11 base channels, 24 with the 6 SPS stress channels."""
    return 24 if opts.tvisco == TpVisco.LAMINAR_SPS else 16
# output channels: forces + density + viscdt, then shifting accumulators
(_OAX, _OAY, _OAZ, _OAR, _ODELTA, _ODBLK, _OVISC,
 _OSHX, _OSHY, _OSHZ, _OSHC, _OSHB) = range(12)


def co_for(opts) -> int:
    """Output channels (the canonical-order output gather scales with CO):
    7 base [ax ay az ar delta dblk visc] + 5 shifting + 6 SPS gradvel,
    padded to a multiple of 8."""
    used = 7 + (5 if opts.shiftmode.value != 0 else 0) \
        + (6 if opts.tvisco == TpVisco.LAMINAR_SPS else 0)
    return -(-used // 8) * 8


def supports(csp: CteSph, opts: SolverOpts) -> bool:
    """Configs the fused kernel covers: artificial or laminar+SPS viscosity,
    DBC or mDBC (the ghost-node correction runs as a jnp pre-pass — it only
    rewrites bound vel/rho before the boundary-type-agnostic force loop),
    any kernel/DDT/shifting, floating bodies (per-particle mass channel)."""
    return (opts.tvisco in (TpVisco.ARTIFICIAL, TpVisco.LAMINAR_SPS)
            and opts.tboundary in (TpBoundary.DBC, TpBoundary.MDBC)
            and not opts.symmetry)


def _round_up(x, m):
    return -(-x // m) * m


GROUP_SX = 16   # x-tile cap per block; blocks chop by count (T_BLOCK)
# target rows per block (sublane dim of the pair tiles).  Taller blocks
# amortize the per-block window DMAs + prologue over more targets at the
# cost of wider candidate windows (the block's x-span grows with T) and
# bigger VMEM tiles — A/B knob DSPH_TBLOCK (must be a multiple of 8).
# Measured on v5e (3D dam break 245k, p50 step): T=32 69.4 ms, T=48 70.4,
# T=64 79.8, T=96 96.6 (all at K=4) — narrower windows win.


def _env_int(name, default, *, mult=1, choices=None):
    import os
    raw = os.environ.get(name, str(default))
    try:
        v = int(raw)
    except ValueError:
        raise ValueError(f"{name} must be an integer, got {raw!r}") from None
    if v <= 0 or v % mult:
        raise ValueError(f"{name} must be a positive multiple of {mult}, "
                         f"got {v}")
    if choices is not None and v not in choices:
        raise ValueError(f"{name} must be one of {choices}, got {v}")
    return v


def tblock() -> int:
    """Target rows per kernel block (DSPH_TBLOCK, multiple of 8) — read at
    every call so tests/runs may set it after import."""
    return _env_int("DSPH_TBLOCK", T_BLOCK_DEFAULT, mult=8)


T_BLOCK_DEFAULT = 32
CW = 128        # candidate lanes per chunk (lane dim of the pair tiles)
# Tuned on v5e: the kernel is dominated by per-block overhead (DMA issue/wait
# chains, prologue), not pair ALU — fewer, taller blocks win; see bench sweeps.

# Shifted-copy alignment: Mosaic dynamic lane slices must start 128-aligned,
# so a window whose true start is w0 wastes w0%128 leading lanes.  With mean
# window content ~106 lanes that cost ~47% of all pair math on dead lanes.
# Fix: keep NSHIFT copies of the packed field matrix, copy k right-shifted by
# k*GSHIFT lanes; each row window picks the copy that puts its first particle
# within GSHIFT lanes of a 128 boundary (the copy index is a traced scalar —
# plain address arithmetic, no branches).
NSHIFT = 8
GSHIFT = CW // NSHIFT   # 16: max dead leading lanes per window


def kblocks() -> int:
    """Sub-blocks per grid step on the row-padded path (DSPH_KBLOCKS,
    must divide 8).  >1 shares the per-grid-step overhead and overlaps the
    K*R window DMAs across the K blocks' pair math.  Default 4: measured
    -9% step time vs 1 on v5e (3D dam break 245k, 77.2 -> 70.4 ms p50;
    K=2 gave 72.7, T_BLOCK 64/96 regressed)."""
    return _env_int("DSPH_KBLOCKS", 4, choices=(1, 2, 4, 8))


def tiles_for(dom: cd.Domain):
    """(T, W) tile sizes for the grouped kernel: T dense target rows
    (blocks pack up to GROUP_SX cells of particles); W covers the x-tile+-1
    candidate window plus up to 127 lanes of DMA alignment."""
    T = tblock()
    W = max(_round_up((GROUP_SX + 2) * dom.cellcap + 127, max(CW, 128)),
            2 * CW)
    return T, W


def tiles_rows(dom: cd.Domain):
    """(T, W) for the row-padded (RowDiv) kernel path: the x-tile chop
    (celldiv.ROWDIV_SX) bounds any block's x-span, so W is a TRUE bound on
    window content — overflow is impossible for in-capacity cells.

    In merged-window mode (celldiv.rowdiv_merged) one window spans up to 3
    consecutive padded rows, each at most round_up(span*cellcap, T) slots."""
    T = tblock()
    span = min(dom.nc[0], cd.ROWDIV_SX)
    if cd.rowdiv_merged(dom):
        rowcap = _round_up(span * dom.cellcap, T)
        W = max(_round_up(3 * rowcap + CW, CW), 2 * CW)
    else:
        W = max(_round_up((span + 2) * dom.cellcap + CW, CW), 2 * CW)
    return T, W


def sa_chunks(dom: cd.Domain, W: int) -> int:
    """Stage-A DMA depth (chunks fetched by the always-issued first copy):
    merged windows typically occupy 3-5 chunks, per-row windows 1-2."""
    return min(6 if cd.rowdiv_merged(dom) else 2, W // CW)


def maxgroups_for(dom: cd.Domain, n: int) -> int:
    """Static block-table capacity: at most one block per occupied x-tile
    plus the T_BLOCK-particle splits."""
    A = dom.maxcells or min(dom.ncells, n)
    return -(-A // GROUP_SX) + -(-n // tblock()) + 64


def _window_loop(tcount_s, wstart_s, wcount_s, sf_ref, out_ref, cwin, sem,
                 make_phys, *, R: int, T: int, W: int, CW: int, CO: int,
                 SA: int = 2, K: int = 1):
    """Generic row-window machinery shared by every pair-physics kernel:
    per-block stage-A/B DMAs of the neighbour-row windows (9/3 per-row, or
    3/1 merged — celldiv.rowdiv_merged) from the shifted-copy field matrix,
    the unrolled row loop with dynamic chunk trip counts, and the final
    (T, CO) store.  ``SA`` = chunks covered by the always-issued stage-A DMA.

    ``K``: sub-blocks per grid step (DSPH_KBLOCKS) — one grid step issues the
    window DMAs of K consecutive blocks up front (block k's DMA waits overlap
    the pair math of blocks < k) and shares the per-step grid overhead.
    Scalar tables stay per-block; the target/output refs carry (K, T, ·)
    tiles and the window scratch is (K*R, C, W).

    ``make_phys(tc, kk) -> (init, chunk_fn, finish)``: traces the target-side
    prologue for sub-block kk; ``chunk_fn((C,CW) slab, (1,CW) lane validity,
    acc) -> acc`` runs the pair math; ``finish(accs) -> (T, CO)``."""
    a = pl.program_id(0)
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1)

    def row_sched(b, r):
        """Window schedule: (copy index, aligned start, first valid lane,
        occupied chunk count).  The shifted copy puts the first particle
        within GSHIFT lanes of the 128 boundary, so wo < GSHIFT and the
        mean occupied-chunk count drops from ~1.8 to ~1.1."""
        w0 = wstart_s[b * R + r]
        wc = wcount_s[b * R + r]
        am = jax.lax.rem(w0, CW)
        k = jax.lax.rem((CW - am + GSHIFT - 1) // GSHIFT, NSHIFT)
        wo = jax.lax.rem(am + k * GSHIFT, CW)
        ws = pl.multiple_of(w0 + k * GSHIFT - wo, CW)
        nch = (wo + wc + CW - 1) // CW
        return k, ws, wo, nch

    def dma_a(b, slot, r):
        # stage A: the first SA chunks — covers nearly every window
        k, ws, _, _ = row_sched(b, r)
        return pltpu.make_async_copy(
            sf_ref.at[k, :, pl.ds(ws, SA * CW)],
            cwin.at[slot, :, pl.ds(0, SA * CW)], sem.at[slot, 0])

    def dma_b(b, slot, r):
        # stage B: the (rare) long tail of the window
        k, ws, _, _ = row_sched(b, r)
        return pltpu.make_async_copy(
            sf_ref.at[k, :, pl.ds(pl.multiple_of(ws + SA * CW, CW),
                                  W - SA * CW)],
            cwin.at[slot, :, pl.ds(SA * CW, W - SA * CW)], sem.at[slot, 1])

    # issue ALL K*R row-window DMAs up front: the per-block cost is
    # dominated by DMA round-trip latency (measured ~1us each, comparable
    # to one row's compute), so overlapping all of them matters more than
    # buffer reuse; VMEM comfortably holds K*R windows
    for kk in range(K):
        b = a * K + kk

        @pl.when(tcount_s[b] > 0)
        def _(kk=kk, b=b):
            for rr in range(R):
                dma_a(b, kk * R + rr, rr).start()
            if W > SA * CW:
                for rr in range(R):
                    _, _, _, nch_rr = row_sched(b, rr)

                    @pl.when(nch_rr > SA)
                    def _(rr=rr):
                        dma_b(b, kk * R + rr, rr).start()

    for kk in range(K):
        b = a * K + kk
        tc = tcount_s[b]

        @pl.when(tc == 0)
        def _(kk=kk):
            out_ref[kk] = jnp.zeros((T, CO), jnp.float32)

        @pl.when(tc > 0)
        def _(kk=kk, b=b):
            init, chunk_fn, finish = make_phys(tc, kk)

            def row_body(r, acc):
                slot = kk * R + r
                _, _, wo, nch = row_sched(b, r)
                wc = wcount_s[b * R + r]
                dma_a(b, slot, r).wait()

                def chunk_body(ch, acc2):
                    off = pl.multiple_of(ch * CW, CW)
                    cw = cwin[slot, :, pl.ds(off, CW)]   # (C, CW)
                    lane1 = lane0 + off                  # (1, CW)
                    clanev = (lane1 >= wo) & (lane1 < wo + wc)
                    return chunk_fn(cw, clanev, acc2)

                # the first chunk always runs (masked if the row is empty);
                # the remaining stage-A chunks unroll as nested conds so
                # short rows skip them (Mosaic's fori_loop costs far more
                # per trip); the stage-B tail waits its DMA then loops
                def from_chunk(ch, acc2):
                    if ch == SA:
                        if W <= SA * CW:
                            return acc2

                        def tail(acc3):
                            dma_b(b, slot, r).wait()
                            return jax.lax.fori_loop(SA, nch, chunk_body,
                                                     acc3)

                        return jax.lax.cond(nch > SA, tail, lambda a3: a3,
                                            acc2)

                    def more(acc3):
                        return from_chunk(ch + 1, chunk_body(ch, acc3))

                    return jax.lax.cond(nch > ch, more, lambda a3: a3, acc2)

                return from_chunk(1, chunk_body(0, acc))

            # unrolled row loop (R is static): lets Mosaic schedule each
            # row's DMA wait against the previous row's compute instead of a
            # serial fori_loop barrier per row
            accs = init
            for rr in range(R):
                accs = row_body(rr, accs)
            out_ref[kk] = finish(accs)


def kernel_mode() -> str:
    """Rows-path kernel generation (DSPH_KERNEL): ``v3`` (default) = trimmed
    per-block windows DMA'd once per block group with double buffering;
    ``v1`` = the round-1/2 whole-window kernel (merged or per-row)."""
    import os
    v = os.environ.get("DSPH_KERNEL", "v3")
    if v not in ("v1", "v3"):
        raise ValueError(f"DSPH_KERNEL must be v1 or v3, got {v!r}")
    return v


def v3_ok(csp: CteSph, opts: SolverOpts) -> bool:
    """Configs the v3 kernel covers: artificial viscosity (any kernel, DDT,
    shifting, floating, DBC/mDBC).  Laminar+SPS stays on the v1 kernel (the
    6 tau channels + gradvel outputs aren't worth a second body yet)."""
    return supports(csp, opts) and opts.tvisco == TpVisco.ARTIFICIAL


def v3_params(dom: cd.Domain, n: int = 0) -> dict:
    """Static v3 kernel geometry: K blocks per group (one union-window DMA
    set per group), WU = narrow window bound, WW = wide fallback bound,
    CAPW = wide-group table capacity."""
    K = _env_int("DSPH_K", 8, choices=(1, 2, 4, 8, 16))
    span = min(dom.nc[0], cd.ROWDIV_SX)
    R = 3 if dom.simulate2d else 9
    PD = cd.v3_planes(dom, n)
    if PD != R:
        # dz-plane-merged DMAs (short rows only, see celldiv.v3_planes): a
        # plane union spans from the dy=-1 row's window START to the dy=+1
        # row's window END — i.e. up to 3 whole consecutive padded rows
        # (the guaranteed WW bound below).  The NARROW bound must cover the
        # TYPICAL 3-row span, not one window: at the 267k bench the
        # plane-union p100 was 2688 lanes while WU=1024 sent 87% of groups
        # to the wide fallback and overflowed CAPW (dropped pairs).
        # min(bound, 3072) keeps the DMA scratch ~1.2 MB and covers every
        # group of the bench configs.
        rowcap = _round_up(span * dom.cellcap, tblock())
        WW = _round_up(3 * rowcap + 256, 128)
        WU = _env_int("DSPH_WU", min(WW, 3072), mult=128)
    else:
        WW = _round_up((span + 2) * dom.cellcap + 256, 128)
        WU = _env_int("DSPH_WU", 1024, mult=128)
    # the target-slab DMA reads K*T lanes past block gblk0's start from the
    # same padded field matrix — its tail pad is WW + CW
    WW = max(WW, WU, _round_up(K * tblock() + CW, 128))
    T = tblock()
    A = -(-max(n, T) // T)
    GCAP = cd.v3_gcap(dom, A, K)
    CAPW = max(GCAP // 4, 64)
    # MC: per-block chunk-descriptor capacity for the flat segment loop
    # (3 chunks per neighbour row covers swc <= 384; excess counted fatal —
    # the 267k bench has rows up to ~250 lanes, i.e. blocks at 2 chunks/row
    # + a few 3s, which overflowed the earlier 2*R cap)
    R = 3 if dom.simulate2d else 9
    MC = _env_int("DSPH_MC", 3 * R)
    return dict(K=K, WU=WU, WW=WW, CAPW=CAPW, MC=MC, PD=PD)


def fast_rows(csp: CteSph, opts: SolverOpts) -> bool:
    """Configs the fast-channel pair body covers (the bench hot path):
    Wendland + artificial viscosity, any DDT, any shifting, floating,
    DBC/mDBC (ghost prepass).  Cubic and laminar+SPS stay on the general
    body."""
    return (supports(csp, opts) and opts.tvisco == TpVisco.ARTIFICIAL
            and csp.tkernel == TpKernel.WENDLAND)


def use_fast_body(csp: CteSph, opts: SolverOpts) -> bool:
    """fast_rows with the A/B switch (DSPH_FASTBODY, default ON): the v3
    kernel runs the fast-channel FMA body (`_make_phys_v4`) instead of the
    canonical-channel body (`_make_phys_v3`) when the config allows it.

    History: a round-3 experiment routed the per-pair accumulations through
    an MXU moment contraction ((nw*T, CW) x (CW, 8) at Precision.HIGHEST);
    it measured 103 ms vs the FMA body's 42 ms (6-pass bf16 decomposition,
    8 of 128 MXU columns live) and was deleted.  The surviving fast body
    keeps only the wins that measured: precomputed lane channels and the
    self-masking kernel clamp."""
    import os
    return os.environ.get("DSPH_FASTBODY", "1") == "1" and fast_rows(csp, opts)


def use_roll() -> bool:
    """DSPH_ROLL (default ON): roll-align the v3 kernel's segment chunks so
    the 128-lane quantization waste disappears (see _kernel_v3)."""
    import os
    return os.environ.get("DSPH_ROLL", "1") == "1"


# fast-path packed channels (interaction_forces_rows builds this layout when
# fast_rows() holds; channels 0-6 and 9 match the canonical layout, 7 becomes
# press/rho, 10 carries mass*bwen/h, 11+ are precomputed lane factors)
_FCPIC = 7      # press * invrho (the EOS half of the pressure term)
_FMICR = 11     # mass * invrho * bwen/h (continuity/shift lane factor)
_FMDDT = 12     # DDT lane factor: +-mass[*invrho]*isfluid*ddtkh*cs0*bwen/h
_FVROW = 13     # -2*cs0*h*visco_eff(kind): artificial-viscosity lane factor
_FBLK = 14      # DDT delta-block lane mask (bound / bound|float), 0/1


def _kernel_fac(csp, rr2, h, inv_h, bwen_h):
    """Kernel gradient factor fac = (1/r) dW/dr (shared by every physics
    body): Wendland without any division, cubic with tensile inputs."""
    rad = jnp.sqrt(rr2)
    if csp.tkernel == TpKernel.WENDLAND:
        qq = rad * inv_h
        wqq1 = 1.0 - 0.5 * qq
        # fac = bwen*q*(1-q/2)^3/r = (bwen/h)*(1-q/2)^3 (no division)
        return bwen_h * (wqq1 * wqq1 * wqq1), rad, qq
    # cubic spline (FunSphKernel.h:104-118)
    qq = rad * inv_h
    kc = csp.kcubic
    inv_rad = pl.reciprocal(jnp.maximum(rad, 1e-18), approx=False)
    outer = jnp.float32(kc.c2) * (2.0 - qq) * (2.0 - qq)
    inner = jnp.float32(kc.c1) * qq + jnp.float32(kc.d1) * qq * qq
    return jnp.where(rad > h, outer, inner) * inv_rad, rad, qq


def _kernel(tcount_s, wstart_s, wcount_s, visco_s,  # scalar prefetch (SMEM)
            tgt_ref, sf_ref,                        # (K,T,C) VMEM / (NSHIFT,C,npad) ANY
            out_ref,                                # (K,T,CO) VMEM
            cwin, sem,                              # scratch: (K*R,C,W) VMEM + DMA sems
            *, csp: CteSph, opts: SolverOpts, R: int, T: int, W: int,
            CW: int, CO: int, C: int, SA: int = 2, K: int = 1):
    def make_phys(tc, kk):
        tgt = tgt_ref[kk]                           # (T, C)
        tx, ty, tz = tgt[:, _CX:_CX + 1], tgt[:, _CY:_CY + 1], tgt[:, _CZ:_CZ + 1]
        tvx, tvy, tvz = tgt[:, _CVX:_CVX + 1], tgt[:, _CVY:_CVY + 1], tgt[:, _CVZ:_CVZ + 1]
        # (T,1) row mask — broadcasts against the (1,CW) lane masks so the
        # mask algebra stays narrow (a (T,CW) iota+compare pair costs 16
        # full-width vector ops each)
        trowv = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) < tc
        tvalid = trowv
        # rho=1 on dead rows keeps every reciprocal finite (0*inf -> NaN trap)
        trho = jnp.where(trowv, tgt[:, _CRHO:_CRHO + 1], 1.0)
        tkind = tgt[:, _CKIND:_CKIND + 1]
        tpress = jnp.where(trowv, tgt[:, _CPRESS:_CPRESS + 1], 0.0)
        inv_trho = jnp.where(trowv, tgt[:, _CINVRHO:_CINVRHO + 1], 1.0)
        bound_t = tkind < 1.5                      # fixed/moving
        float_t = (tkind > 1.5) & (tkind < 2.5)    # floating target
        tfl = (tkind > 2.5).astype(jnp.float32)    # fluid target (not floating)

        h = jnp.float32(csp.kernelh)
        inv_h = jnp.float32(1.0 / csp.kernelh)
        bwen_h = jnp.float32(csp.kwend.bwen / csp.kernelh)
        ks2 = jnp.float32(csp.kernelsize2)
        eta2 = jnp.float32(csp.eta2)
        cbar = jnp.float32(csp.cs0)
        # traced scalars (SMEM prefetch): viscosity (JDsViscoInput time
        # series) and the DDT constant (RunInitialDDTRamp) — csp values
        # when no time variation is configured
        ddtkh = visco_s[1]
        visco = visco_s[0]
        viscobf = visco * jnp.float32(csp.viscoboundfactor)

        # (T, CW) accumulators: chunk bodies add elementwise partials and the
        # lane reduction happens ONCE at the end — per-chunk jnp.sum costs
        # ~log2(CW) shuffle-add steps per accumulator, which measurably
        # dominated the chunk op count
        zTC = jnp.zeros((T, CW), jnp.float32)
        use_sps = opts.tvisco == TpVisco.LAMINAR_SPS
        nacc = 6 + (5 if opts.shiftmode.value != 0 else 0) \
            + (6 if use_sps else 0)
        init = tuple([zTC] * nacc) + (
            jnp.full((T, CW), -3.4e38, jnp.float32),)
        if use_sps:
            ttau = [tgt[:, _CTAU + i:_CTAU + i + 1] for i in range(6)]

        def chunk_fn(cw, clanev, acc2):
                rest = list(acc2)
                ax, ay, az, ar_, dlt, dblk = rest[:6]
                k = 6
                if opts.shiftmode.value != 0:
                    shx, shy, shz, shc, shb = rest[k:k + 5]
                    k += 5
                if use_sps:
                    gxx, gxy, gxz, gyy, gyz, gzz = rest[k:k + 6]
                    k += 6
                vmax = rest[-1]
                cx, cy, cz = cw[_CX:_CX + 1, :], cw[_CY:_CY + 1, :], cw[_CZ:_CZ + 1, :]
                cvx, cvy, cvz = cw[_CVX:_CVX + 1, :], cw[_CVY:_CVY + 1, :], cw[_CVZ:_CVZ + 1, :]
                crho = jnp.where(clanev, cw[_CRHO:_CRHO + 1, :], 1.0)
                ckind = cw[_CKIND:_CKIND + 1, :]
                cpress = jnp.where(clanev, cw[_CPRESS:_CPRESS + 1, :], 0.0)
                inv_crho = jnp.where(clanev, cw[_CINVRHO:_CINVRHO + 1, :], 1.0)
                bound_c = ckind < 1.5
                float_c = (ckind > 1.5) & (ckind < 2.5)
                mass2 = cw[_CMASS:_CMASS + 1, :]

                dx = tx - cx                         # (T, CW)
                dy = ty - cy
                dz = tz - cz
                rr2 = dx * dx + dy * dy + dz * dz
                pair = (tvalid & clanev & (rr2 <= ks2)
                        & ~(bound_t & bound_c))
                pw = pair.astype(jnp.float32)

                fac, rad, qq = _kernel_fac(csp, rr2, h, inv_h, bwen_h)
                need_fr = use_sps or opts.shiftmode.value != 0
                if need_fr:
                    frx, fry, frz = fac * dx, fac * dy, fac * dz

                dvx = tvx - cvx
                dvy = tvy - cvy
                dvz = tvz - cvz
                dot = dx * dvx + dy * dvy + dz * dvz
                # fr = fac*dr, so dv.fr = fac*dot and dr.fr = fac*rr2 —
                # two dot products for free
                dvfr = fac * dot
                drfr = fac * rr2
                inv_rr2e = pl.reciprocal(rr2 + eta2, approx=False)
                dot_rr2 = dot * inv_rr2e

                w_mom = pw * jnp.where(bound_t, 0.0, 1.0)

                # momentum + artificial viscosity (JSphCpu.cpp:713-716, :757-764)
                prs = (tpress + cpress) * (inv_trho * inv_crho)
                if csp.tkernel == TpKernel.CUBIC:
                    # tensile correction (FunSphKernel.h:138-150)
                    kc = csp.kcubic
                    w_out = jnp.float32(kc.a24) * (2.0 - qq) ** 3
                    w_in = jnp.float32(kc.a2) * (1.0 + (0.75 * qq - 1.5) * qq * qq)
                    wab = jnp.where(rad > h, w_out, w_in)
                    fab = wab * jnp.float32(kc.od_wdeltap)
                    fab = fab * fab
                    fab = fab * fab
                    t1 = (tpress * (inv_trho * inv_trho)
                          * jnp.where(tpress > 0, 0.01, -0.2))
                    t2 = (cpress * (inv_crho * inv_crho)
                          * jnp.where(cpress > 0, 0.01, -0.2))
                    prs = prs + fab * (t1 + t2)
                pm2 = pw * mass2                  # pair weight * mass2
                w_momm = pm2 * jnp.where(bound_t, 0.0, 1.0)
                inv_sumrho = pl.reciprocal(trho + crho, approx=False)
                if not use_sps:
                    # artificial viscosity (JSphCpu.cpp:757-764); visc row
                    # constant: -2*cbar*h*visco(bound) per candidate lane
                    vrow = (-2.0 * cbar * h) * jnp.where(bound_c, viscobf,
                                                         visco)
                    pi_visc = jnp.where(dot < 0, vrow * dot_rr2 * inv_sumrho,
                                        0.0)
                    coef = -w_momm * (prs + pi_visc)
                else:
                    coef = -w_momm * prs
                if need_fr:
                    ax = ax + coef * frx
                    ay = ay + coef * fry
                    az = az + coef * frz
                else:
                    # fr = fac*dr: fold fac into the coefficient and FMA on
                    # the raw dr components (saves the 3 fr products)
                    cf = coef * fac
                    ax = ax + cf * dx
                    ay = ay + cf * dy
                    az = az + cf * dz
                if use_sps:
                    # laminar operator (JSphCpu.cpp:765-775): temp =
                    # 4*visc/((rr2+eta2)*(rho1+rho2)), ace += m2*temp*drfr*dv
                    visco_row = jnp.where(bound_c, viscobf, visco)
                    vtemp = w_momm * ((4.0 * visco_row) * inv_rr2e
                                      * inv_sumrho) * drfr
                    ax = ax + vtemp * dvx
                    ay = ay + vtemp * dvy
                    az = az + vtemp * dvz
                    # SPS stress divergence (JSphCpu.cpp:776-782): tau_sum =
                    # tau_t + tau_c (candidate term only for fluid neighbours)
                    cm = (~bound_c & ~float_c).astype(jnp.float32)
                    t0 = ttau[0] + cm * cw[_CTAU + 0:_CTAU + 1, :]
                    t1 = ttau[1] + cm * cw[_CTAU + 1:_CTAU + 2, :]
                    t2 = ttau[2] + cm * cw[_CTAU + 2:_CTAU + 3, :]
                    t3 = ttau[3] + cm * cw[_CTAU + 3:_CTAU + 4, :]
                    t4 = ttau[4] + cm * cw[_CTAU + 4:_CTAU + 5, :]
                    t5 = ttau[5] + cm * cw[_CTAU + 5:_CTAU + 6, :]
                    ax = ax + w_momm * (t0 * frx + t1 * fry + t2 * frz)
                    ay = ay + w_momm * (t1 * frx + t3 * fry + t4 * frz)
                    az = az + w_momm * (t2 * frx + t4 * fry + t5 * frz)
                    # velocity gradients (GetVelocityGradients_SPH_tsym)
                    volp2 = -(w_momm * jnp.where(float_t, 0.0, 1.0)) \
                        * inv_crho
                    gvx = dvx * volp2
                    gvy = dvy * volp2
                    gvz = dvz * volp2
                    gxx = gxx + gvx * frx
                    gxy = gxy + gvx * fry + gvy * frx
                    gxz = gxz + gvx * frz + gvz * frx
                    gyy = gyy + gvy * fry
                    gyz = gyz + gvy * frz + gvz * fry
                    gzz = gzz + gvz * frz

                # continuity (JSphCpu.cpp:720)
                ar_ = ar_ + pm2 * dvfr * (trho * inv_crho)

                # density diffusion
                if opts.tdensity == TpDensity.MOLTENI:
                    visc_densi = ddtkh * cbar * (trho * inv_crho - 1.0) * inv_rr2e
                    add = (jnp.where(bound_c | float_c, 0.0, w_mom) * tfl
                           * visc_densi * drfr * mass2)
                    dlt = dlt + add
                    blkc = (bound_c if opts.tboundary == TpBoundary.DBC
                            else jnp.zeros_like(bound_c))
                    dblk = dblk + w_mom * tfl * (blkc | float_c).astype(
                        jnp.float32)
                elif opts.tdensity in (TpDensity.FOURTAKAS, TpDensity.FOURTAKAS_FULL):
                    # drhop = rho0*((1+x)^(1/g) - 1), 3-term Taylor (x ~ 1e-3)
                    # with constants folded: c1*dz + c2*dz^2 + c3*dz^3
                    ag = 1.0 / csp.gamma
                    gz = csp.ddtgz
                    c1 = jnp.float32(csp.rhopzero * ag * gz)
                    c2 = jnp.float32(csp.rhopzero * ag * (ag - 1.0) * 0.5
                                     * gz * gz)
                    c3 = jnp.float32(csp.rhopzero * ag * (ag - 1.0)
                                     * (ag - 2.0) / 6.0 * gz * gz * gz)
                    drhop = dz * (c1 + dz * (c2 + dz * c3))
                    visc_densi = (ddtkh * cbar) * ((crho - trho) - drhop) \
                        * inv_rr2e
                    # mass2*inv_crho is a (1,CW) row op; the bound/float mask
                    # folds into it lane-wise
                    mrow = jnp.where(bound_c | float_c, 0.0,
                                     mass2 * inv_crho)
                    sub = (w_mom * tfl) * visc_densi * drfr * mrow
                    dlt = dlt - sub
                    if opts.tdensity == TpDensity.FOURTAKAS:
                        dblk = dblk + w_mom * tfl * bound_c.astype(jnp.float32)

                if opts.shiftmode.value != 0:
                    # shifting accumulators (JSphCpu.cpp:743-750)
                    massrhop = w_mom * mass2 * inv_crho
                    shx = shx + massrhop * frx
                    shy = shy + massrhop * fry
                    shz = shz + massrhop * frz
                    shc = shc - massrhop * drfr
                    if opts.shiftmode.value == 1:      # NO_BOUND
                        blk = pair & ~bound_t & (bound_c | float_c)
                    elif opts.shiftmode.value == 2:    # NO_FIXED
                        blk = pair & ~bound_t & (ckind < 0.5)
                    else:
                        blk = jnp.zeros_like(pair)
                    shb = shb + blk.astype(jnp.float32)

                # viscdt (max dot_rr2 over computing pairs)
                vmax = jnp.maximum(vmax, jnp.where(pair, dot_rr2, -3.4e38))
                outacc = [ax, ay, az, ar_, dlt, dblk]
                if opts.shiftmode.value != 0:
                    outacc += [shx, shy, shz, shc, shb]
                if use_sps:
                    outacc += [gxx, gxy, gxz, gyy, gyz, gzz]
                return tuple(outacc) + (vmax,)

        def finish(accs):
            red = lambda x: jnp.sum(x, axis=1, keepdims=True)
            cols = [red(acc_i) for acc_i in accs[:-1]]
            vcol = jnp.maximum(jnp.max(accs[-1], axis=1, keepdims=True), 0.0)
            # layout: [ax ay az ar delta dblk visc (shift5) (gradvel6)] + pad
            cols = cols[:6] + [vcol] + cols[6:]
            return jnp.concatenate(
                cols + [jnp.zeros((T, CO - len(cols)), jnp.float32)], axis=1)

        return init, chunk_fn, finish

    _window_loop(tcount_s, wstart_s, wcount_s, sf_ref, out_ref, cwin, sem,
                 make_phys, R=R, T=T, W=W, CW=CW, CO=CO, SA=SA, K=K)


def _make_phys_v3(tgt_get, visco_s, csp: CteSph, opts: SolverOpts, *,
                  T, CW, CO):
    """v3 pair physics: the v1 body (same reference semantics,
    `JSphCpu.cpp:631-822`) minus the dead-target-row masking — dead slots
    carry poisoned x (20 cells outside the map) and sanitized vel/rho/press,
    so the rr2 cutoff masks them and every reciprocal stays finite.  No SPS
    (v3_ok gates laminar+SPS onto the v1 kernel)."""
    shift = opts.shiftmode.value
    tdens = opts.tdensity

    h = jnp.float32(csp.kernelh)
    inv_h = jnp.float32(1.0 / csp.kernelh)
    bwen_h = jnp.float32(csp.kwend.bwen / csp.kernelh)
    ks2 = jnp.float32(csp.kernelsize2)
    eta2 = jnp.float32(csp.eta2)
    cbar = jnp.float32(csp.cs0)
    ddtkh = visco_s[1]
    visco = visco_s[0]
    viscobf = visco * jnp.float32(csp.viscoboundfactor)

    def make_phys(kk):
        tgt = tgt_get(kk)                           # (T, C)
        tx, ty, tz = (tgt[:, _CX:_CX + 1], tgt[:, _CY:_CY + 1],
                      tgt[:, _CZ:_CZ + 1])
        tvx, tvy, tvz = (tgt[:, _CVX:_CVX + 1], tgt[:, _CVY:_CVY + 1],
                         tgt[:, _CVZ:_CVZ + 1])
        trho = tgt[:, _CRHO:_CRHO + 1]
        tkind = tgt[:, _CKIND:_CKIND + 1]
        tpress = tgt[:, _CPRESS:_CPRESS + 1]
        inv_trho = tgt[:, _CINVRHO:_CINVRHO + 1]
        bound_t = tkind < 1.5
        tfl = (tkind > 2.5).astype(jnp.float32)
        notb_t = jnp.where(bound_t, 0.0, 1.0)

        zTC = jnp.zeros((T, CW), jnp.float32)
        nacc = 6 + (5 if shift else 0)
        init = tuple([zTC] * nacc) + (
            jnp.full((T, CW), -3.4e38, jnp.float32),)

        def chunk_fn(cw, clanev, acc2):
            rest = list(acc2)
            ax, ay, az, ar_, dlt, dblk = rest[:6]
            if shift:
                shx, shy, shz, shc, shb = rest[6:11]
            vmax = rest[-1]
            cx = cw[_CX:_CX + 1, :]
            cy = cw[_CY:_CY + 1, :]
            cz = cw[_CZ:_CZ + 1, :]
            cvx = cw[_CVX:_CVX + 1, :]
            cvy = cw[_CVY:_CVY + 1, :]
            cvz = cw[_CVZ:_CVZ + 1, :]
            crho = cw[_CRHO:_CRHO + 1, :]
            ckind = cw[_CKIND:_CKIND + 1, :]
            cpress = cw[_CPRESS:_CPRESS + 1, :]
            inv_crho = cw[_CINVRHO:_CINVRHO + 1, :]
            bound_c = ckind < 1.5
            float_c = (ckind > 1.5) & (ckind < 2.5)
            mass2 = cw[_CMASS:_CMASS + 1, :]

            dx = tx - cx                             # (T, CW)
            dy = ty - cy
            dz = tz - cz
            rr2 = dx * dx + dy * dy + dz * dz
            pair = clanev & (rr2 <= ks2) & ~(bound_t & bound_c)
            pw = pair.astype(jnp.float32)

            fac, rad, qq = _kernel_fac(csp, rr2, h, inv_h, bwen_h)
            dvx = tvx - cvx
            dvy = tvy - cvy
            dvz = tvz - cvz
            dot = dx * dvx + dy * dvy + dz * dvz
            dvfr = fac * dot
            drfr = fac * rr2
            inv_rr2e = pl.reciprocal(rr2 + eta2, approx=False)
            dot_rr2 = dot * inv_rr2e

            prs = (tpress + cpress) * (inv_trho * inv_crho)
            if csp.tkernel == TpKernel.CUBIC:
                kc = csp.kcubic
                w_out = jnp.float32(kc.a24) * (2.0 - qq) ** 3
                w_in = jnp.float32(kc.a2) * (1.0 + (0.75 * qq - 1.5) * qq * qq)
                wab = jnp.where(rad > h, w_out, w_in)
                fab = wab * jnp.float32(kc.od_wdeltap)
                fab = fab * fab
                fab = fab * fab
                t1 = (tpress * (inv_trho * inv_trho)
                      * jnp.where(tpress > 0, 0.01, -0.2))
                t2 = (cpress * (inv_crho * inv_crho)
                      * jnp.where(cpress > 0, 0.01, -0.2))
                prs = prs + fab * (t1 + t2)
            pm2 = pw * mass2
            w_momm = pm2 * notb_t
            inv_sumrho = pl.reciprocal(trho + crho, approx=False)
            vrow = (-2.0 * cbar * h) * jnp.where(bound_c, viscobf, visco)
            pi_visc = jnp.where(dot < 0, vrow * dot_rr2 * inv_sumrho, 0.0)
            cf = -w_momm * (prs + pi_visc) * fac
            ax = ax + cf * dx
            ay = ay + cf * dy
            az = az + cf * dz

            ar_ = ar_ + pm2 * dvfr * (trho * inv_crho)

            w_mom = pw * notb_t
            if tdens == TpDensity.MOLTENI:
                visc_densi = ddtkh * cbar * (trho * inv_crho - 1.0) * inv_rr2e
                add = (jnp.where(bound_c | float_c, 0.0, w_mom) * tfl
                       * visc_densi * drfr * mass2)
                dlt = dlt + add
                blkc = (bound_c if opts.tboundary == TpBoundary.DBC
                        else jnp.zeros_like(bound_c))
                dblk = dblk + w_mom * tfl * (blkc | float_c).astype(
                    jnp.float32)
            elif tdens in (TpDensity.FOURTAKAS, TpDensity.FOURTAKAS_FULL):
                ag = 1.0 / csp.gamma
                gz = csp.ddtgz
                c1 = jnp.float32(csp.rhopzero * ag * gz)
                c2 = jnp.float32(csp.rhopzero * ag * (ag - 1.0) * 0.5
                                 * gz * gz)
                c3 = jnp.float32(csp.rhopzero * ag * (ag - 1.0)
                                 * (ag - 2.0) / 6.0 * gz * gz * gz)
                drhop = dz * (c1 + dz * (c2 + dz * c3))
                visc_densi = (ddtkh * cbar) * ((crho - trho) - drhop) \
                    * inv_rr2e
                mrow = jnp.where(bound_c | float_c, 0.0, mass2 * inv_crho)
                sub = (w_mom * tfl) * visc_densi * drfr * mrow
                dlt = dlt - sub
                if tdens == TpDensity.FOURTAKAS:
                    dblk = dblk + w_mom * tfl * bound_c.astype(jnp.float32)

            if shift:
                frx, fry, frz = fac * dx, fac * dy, fac * dz
                massrhop = w_mom * mass2 * inv_crho
                shx = shx + massrhop * frx
                shy = shy + massrhop * fry
                shz = shz + massrhop * frz
                shc = shc - massrhop * drfr
                if shift == 1:      # NO_BOUND
                    blk = pair & ~bound_t & (bound_c | float_c)
                elif shift == 2:    # NO_FIXED
                    blk = pair & ~bound_t & (ckind < 0.5)
                else:
                    blk = jnp.zeros_like(pair)
                shb = shb + blk.astype(jnp.float32)

            vmax = jnp.maximum(vmax, jnp.where(pair, dot_rr2, -3.4e38))
            outacc = [ax, ay, az, ar_, dlt, dblk]
            if shift:
                outacc += [shx, shy, shz, shc, shb]
            return tuple(outacc) + (vmax,)

        def finish(accs):
            red = lambda x: jnp.sum(x, axis=1, keepdims=True)
            cols = [red(a) for a in accs[:-1]]
            vcol = jnp.maximum(jnp.max(accs[-1], axis=1, keepdims=True), 0.0)
            cols = cols[:6] + [vcol] + cols[6:]
            return jnp.concatenate(
                cols + [jnp.zeros((T, CO - len(cols)), jnp.float32)], axis=1)

        return init, chunk_fn, finish

    return make_phys


def _make_phys_v4(tgt_get, csp: CteSph, opts: SolverOpts, *, T, CW, CO):
    """v4 pair physics: the v3 trimmed-window body on the fast-channel
    layout (see `_fast_channels` for the channel docs) with v1-style FMA
    accumulation — no MXU contraction.  Same reference semantics
    (`InteractionForcesFluid`, JSphCpu.cpp:631-822); op-count cuts vs v3:

    * **Self-masking kernel clamp** — facm = (bwen/h)*max(1-q/2,0)^3 * mask
      is exactly zero outside the support (q>=2 <=> rr2>=kernelsize2), for
      poisoned dead slots and for bound-bound pairs, so the explicit
      rr2<=ks2 compare, the pair bool and its where() chains all disappear.
    * **Precomputed lane channels** — press/rho, mass*bwen/h,
      mass*invrho*bwen/h, the DDT lane factor (sign, kind mask and
      ddtkh*cs0 folded) and the artificial-viscosity row factor
      (-2*cs0*h*visco(kind)) are one fused XLA pass over n instead of
      per-candidate-lane work ((1,CW) and (T,1) ops cost 1 VPU issue;
      (T,CW) ops cost T/8).
    * **Approximate reciprocals** for 1/(rr2+eta2) and 1/(rho1+rho2): both
      feed only the artificial-viscosity and DDT diffusion terms (relative
      error ~1e-6 on terms that are themselves O(alpha)~0.1 corrections).

    Wendland + artificial viscosity only (fast_rows gate)."""
    shift = opts.shiftmode.value
    tdens = opts.tdensity
    h05 = jnp.float32(0.5 / csp.kernelh)
    eta2 = jnp.float32(csp.eta2)
    if tdens in (TpDensity.FOURTAKAS, TpDensity.FOURTAKAS_FULL):
        ag = 1.0 / csp.gamma
        gz = csp.ddtgz
        ddt_c1 = jnp.float32(csp.rhopzero * ag * gz)
        ddt_c2 = jnp.float32(csp.rhopzero * ag * (ag - 1.0) * 0.5 * gz * gz)
        ddt_c3 = jnp.float32(csp.rhopzero * ag * (ag - 1.0) * (ag - 2.0)
                             / 6.0 * gz ** 3)

    def make_phys(kk):
        tgt = tgt_get(kk)                           # (T, C)
        tx, ty, tz = (tgt[:, _CX:_CX + 1], tgt[:, _CY:_CY + 1],
                      tgt[:, _CZ:_CZ + 1])
        tvx, tvy, tvz = (tgt[:, _CVX:_CVX + 1], tgt[:, _CVY:_CVY + 1],
                         tgt[:, _CVZ:_CVZ + 1])
        trho = tgt[:, _CRHO:_CRHO + 1]
        tkind = tgt[:, _CKIND:_CKIND + 1]
        b_t = tgt[:, _FCPIC:_FCPIC + 1]             # press/rho
        it_t = tgt[:, _CINVRHO:_CINVRHO + 1]
        bkt = (tkind < 1.5).astype(jnp.float32)     # bound target (T,1)
        tfl = (tkind > 2.5).astype(jnp.float32)
        notb_t = 1.0 - bkt

        zTC = jnp.zeros((T, CW), jnp.float32)
        nacc = 6 + (5 if shift else 0)
        init = tuple([zTC] * nacc) + (zTC,)

        def chunk_fn(cw, clanev, acc2):
            rest = list(acc2)
            ax, ay, az, ar_, dlt, dblk = rest[:6]
            if shift:
                shx, shy, shz, shc, shb = rest[6:11]
            vmax = rest[-1]
            clf = clanev.astype(jnp.float32)         # (1, CW)
            cx = cw[_CX:_CX + 1, :]
            cy = cw[_CY:_CY + 1, :]
            cz = cw[_CZ:_CZ + 1, :]
            cvx = cw[_CVX:_CVX + 1, :]
            cvy = cw[_CVY:_CVY + 1, :]
            cvz = cw[_CVZ:_CVZ + 1, :]
            crho = cw[_CRHO:_CRHO + 1, :]
            cpic = cw[_FCPIC:_FCPIC + 1, :]
            ic = cw[_CINVRHO:_CINVRHO + 1, :]
            bkcl = (cw[_CKIND:_CKIND + 1, :] < 1.5).astype(jnp.float32) * clf
            m2 = cw[_CMASS:_CMASS + 1, :]            # mass*bwen/h

            dx = tx - cx                             # (T, CW)
            dy = ty - cy
            dz = tz - cz
            rr2 = dx * dx + dy * dy + dz * dz
            s = jax.lax.rsqrt(jnp.maximum(rr2, 1e-30))
            rs = rr2 * s                             # = r (0.5/h folded below)
            wqq1 = jnp.maximum(1.0 - h05 * rs, 0.0)
            # mask WITH candidate mass*bwen/h folded in (two (1,CW) ops +
            # one (T,CW) fma replace the mask fma AND the cf *m2): facm==0
            # IS the pair cutoff, dead-slot guard and bound-bound block
            mrow = m2 * clf                          # (1, CW)
            mbb = m2 * bkcl                          # (1, CW)
            maskm = mrow - bkt * mbb
            facm = (wqq1 * wqq1) * wqq1 * maskm      # wqq1^3 * mask * m2

            dvx = tvx - cvx
            dvy = tvy - cvy
            dvz = tvz - cvz
            dot = dx * dvx + dy * dvy + dz * dvz
            # approx reciprocal + ONE Newton step (~1e-6 rel): dot_rr2 feeds
            # viscdtmax (the dt controller), which needs better than the raw
            # ~1e-3 estimate; still ~half the ops of the exact divide
            re2 = rr2 + eta2
            r0 = pl.reciprocal(re2, approx=True)
            inv_rr2e = r0 * (2.0 - re2 * r0)
            dot_rr2 = dot * inv_rr2e

            # pressure + artificial viscosity (JSphCpu.cpp:713-716,:757-764);
            # vrow<0 makes pv>0 exactly when dot<0: relu replaces the select
            prs = b_t * ic + it_t * cpic
            # one Newton step here too: pv enters the momentum sum, and the
            # raw ~1e-3 estimate scales the error with the visco coefficient
            # (high-visco configs would see it); marginal cost (2 ops/pair)
            srho = trho + crho
            s0 = pl.reciprocal(srho, approx=True)
            isum = s0 * (2.0 - srho * s0)
            pv = cw[_FVROW:_FVROW + 1, :] * dot_rr2 * isum
            cf = -(prs + jnp.maximum(pv, 0.0)) * facm   # m2 inside facm
            ax = ax + cf * dx
            ay = ay + cf * dy
            az = az + cf * dz

            # continuity (JSphCpu.cpp:720): * trho at finish
            # (facm carries m2, so * ic == the old mass*invrho channel)
            ar_ = ar_ + (dot * facm) * ic

            # facm carries m2 = mass*bwen/h < 0 (bwen is the negative
            # Wendland gradient constant): pair presence is facm != 0
            pw = (facm != 0).astype(jnp.float32)
            if tdens in (TpDensity.FOURTAKAS, TpDensity.FOURTAKAS_FULL):
                drhop = dz * (ddt_c1 + dz * (ddt_c2 + dz * ddt_c3))
                vd = ((crho - trho) - drhop) * inv_rr2e
                dlt = dlt + vd * (rr2 * facm) * cw[_FMDDT:_FMDDT + 1, :]
            elif tdens == TpDensity.MOLTENI:
                vd = (trho * ic - 1.0) * inv_rr2e
                dlt = dlt + vd * (rr2 * facm) * cw[_FMDDT:_FMDDT + 1, :]
            if tdens != TpDensity.NONE:
                dblk = dblk + pw * cw[_FBLK:_FBLK + 1, :]

            if shift:
                massrhop = facm * ic   # facm carries m2
                shx = shx + massrhop * dx
                shy = shy + massrhop * dy
                shz = shz + massrhop * dz
                shc = shc - massrhop * rr2
                if shift == 1:      # NO_BOUND: bound|floating candidates
                    blkm = (cw[_CKIND:_CKIND + 1, :] < 2.5).astype(
                        jnp.float32) * clf
                elif shift == 2:    # NO_FIXED
                    blkm = (cw[_CKIND:_CKIND + 1, :] < 0.5).astype(
                        jnp.float32) * clf
                else:
                    blkm = jnp.zeros((1, CW), jnp.float32)
                shb = shb + pw * blkm
            vmax = jnp.maximum(vmax, dot_rr2 * pw)
            outacc = [ax, ay, az, ar_, dlt, dblk]
            if shift:
                outacc += [shx, shy, shz, shc, shb]
            return tuple(outacc) + (vmax,)

        def finish(accs):
            red = lambda x: jnp.sum(x, axis=1, keepdims=True)
            notb = notb_t
            ax = red(accs[0]) * notb
            ay = red(accs[1]) * notb
            az = red(accs[2]) * notb
            ar = red(accs[3]) * trho
            dlt = red(accs[4]) * tfl
            dblk = red(accs[5]) * tfl
            vcol = jnp.maximum(jnp.max(accs[-1], axis=1, keepdims=True), 0.0)
            cols = [ax, ay, az, ar, dlt, dblk, vcol]
            if shift:
                shx = red(accs[6]) * notb
                shy = red(accs[7]) * notb
                shz = red(accs[8]) * notb
                shc = red(accs[9]) * notb
                shb = red(accs[10]) * notb
                cols += [shx, shy, shz, shc, shb]
            return jnp.concatenate(
                cols + [jnp.zeros((T, CO - len(cols)), jnp.float32)], axis=1)

        return init, chunk_fn, finish

    return make_phys


def _fast_channels(csp: CteSph, opts: SolverOpts, dom: cd.Domain, NP,
                   pos, vel, rho, code, ftomassp, visco, ddtkh):
    """Fast-layout packed channels (see `_make_phys_v4` channel docs):
    press/rho, mass*bwen/h, m2*invrho, the DDT lane factor (sign + candidate
    kind mask + ddtkh*cs0 folded) and the artificial-viscosity row factor.
    visco/ddtkh are traced scalars (JDsViscoInput time series / DDT ramp) —
    the channels rebuild every interaction so folding them is free."""
    act = td.is_active(code)
    ikind = td.code_type(code)
    kind = ikind.astype(jnp.float32)
    poison = jnp.float32(dom.posmin[0] - 20.0 * dom.scell)
    px = jnp.where(act, pos[:, 0], poison)
    py = jnp.where(act, pos[:, 1], jnp.float32(dom.posmin[1]
                                               - 20.0 * dom.scell))
    pz = jnp.where(act, pos[:, 2], jnp.float32(dom.posmin[2]
                                               - 20.0 * dom.scell))
    rho_s = jnp.where(act, rho, 1.0)
    vel_s = jnp.where(act[:, None], vel, 0.0)
    press = jnp.where(act, _press(csp, rho_s), 0.0)
    invr = 1.0 / rho_s
    mass = jnp.where(ikind >= td.TYPE_FLUID, csp.massfluid,
                     csp.massbound).astype(jnp.float32)
    if ftomassp is not None:
        mass = jnp.where(ikind == td.TYPE_FLOATING,
                         jnp.take(jnp.asarray(ftomassp, jnp.float32),
                                  td.code_value(code), mode="clip"), mass)
    bwen_h = jnp.float32(csp.kwend.bwen / csp.kernelh)
    m2 = mass * bwen_h
    micr = m2 * invr
    vb = jnp.asarray(csp.visco if visco is None else visco, jnp.float32)
    dk = jnp.asarray(csp.ddtkh if ddtkh is None else ddtkh, jnp.float32)
    cs0h = jnp.float32(csp.cs0) * jnp.float32(csp.kernelh)
    isbound = kind < 1.5
    fvrow = (-2.0 * cs0h) * jnp.where(
        isbound, vb * jnp.float32(csp.viscoboundfactor), vb)
    isfl = (ikind == td.TYPE_FLUID).astype(jnp.float32)
    dkc = dk * jnp.float32(csp.cs0)
    # NOTE: no m2 factor here — the pair body folds candidate mass into
    # facm (facm' = wqq1^3 * mask * m2), so the DDT lane factor supplies
    # only the remaining isfl * dkc (* invr) part
    if opts.tdensity == TpDensity.MOLTENI:
        fmddt = isfl * dkc
        blkm = (isbound | (ikind == td.TYPE_FLOATING)
                if opts.tboundary == TpBoundary.DBC
                else (ikind == td.TYPE_FLOATING))
        fblk = blkm.astype(jnp.float32)
    elif opts.tdensity in (TpDensity.FOURTAKAS, TpDensity.FOURTAKAS_FULL):
        fmddt = isfl * (-(dkc) * invr)
        # FULL keeps the diffusion active near boundaries (reference
        # DDT_DDT2Full, JSphCpu.cpp:733-740): no delta-block mask
        fblk = (jnp.zeros_like(kind)
                if opts.tdensity == TpDensity.FOURTAKAS_FULL
                else isbound.astype(jnp.float32))
    else:
        fmddt = fblk = jnp.zeros_like(kind)
    chans = [px, py, pz, vel_s[:, 0], vel_s[:, 1], vel_s[:, 2], rho_s,
             press * invr, invr, kind, m2, micr, fmddt, fvrow, fblk]
    # layout guard: the kernel body (_make_phys_v4) indexes these channels
    # by the _F* constants — build and body must not diverge
    assert len(chans) == _FBLK + 1
    return chans, ikind


def _kernel_v3(gblk_s, gskip_s, gws_s, gwc_s, soff_s, swc_s, desc_s, chn_s,
               visco_s,                               # scalar prefetch (9)
               *refs, csp: CteSph, opts: SolverOpts, R: int, T: int,
               W: int, CW: int, CO: int, C: int, K: int, NG: int,
               NBUF: int, PD: int = None, UNROLL: int = 4, MC: int = 18,
               fast: bool = False, roll: bool = True, flat: bool = False,
               ablate: str = ""):
    """v3 window loop: one grid step = one group of K blocks sharing R
    union-window DMAs (double-buffered across grid steps when NBUF=2); each
    block's pair math runs only its own trimmed [soff, soff+swc) segment of
    the union.

    ``roll=True`` (DSPH_ROLL): each chunk reads the (C, 2*CW) aligned slab
    covering segment lanes [v*CW, (v+1)*CW) and lane-rotates it so the
    segment starts at lane 0 — chunks per segment drop from
    1 + (soff%%CW + swc - 1)//CW (mean ~1.9 at swc~100) to ceil(swc/CW)
    (mean ~1.0), i.e. the 128-lane alignment quantization that round 4's
    profile measured as ~2x of all pair math disappears for ~4 extra vreg
    ops per chunk (the dynamic rotate of 4 vregs).  The lane-validity mask
    becomes a pure tail guard (one compare instead of two).

    TPU re-design rationale (vs the v1 whole-window sweep): the 267k bench
    profile measured 3% live-lane fraction — merged whole-row windows make
    every block pay the full x-extent of 3 cell rows while each target needs
    KernelSize (~3 cells).  Trimmed segments cut pair math ~6x and the
    group-level DMA sharing keeps the DMA issue count at 9 per K blocks.

    Targets need NO separate array or per-block fetches: the group's K*T
    target rows are CONTIGUOUS lanes [gblk0*T, gblk0*T + K*T) of the packed
    field matrix itself (the row-padded layout's defining property), so one
    lane-rolled DMA from ``sf`` + one in-kernel (C, K*T) transpose replaces
    the K per-block (1, T, C) auto-fetches AND the XLA-side (A, T, C)
    target build — measured round 4, the kernel is bound by per-grid-step
    DMA issue/wait count, not pair math."""
    sf_ref = refs[0]
    # ONE fused (1, T, K*CO) output block per group (K separate (1, T, CO)
    # blocks cost K tiny copy-out DMAs per grid step)
    out_ref = refs[1]

    def store(kk, val):
        out_ref[0, :, kk * CO:(kk + 1) * CO] = val

    cwin, sem, tbuf, tsem = refs[2:]
    g = pl.program_id(0)
    if PD is None:
        PD = R
    RP = R // PD          # segment rows per DMA plane
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1)
    MAXCH = W // CW
    WP = W + CW     # scratch/DMA width: +CW so the roll path's 2*CW slab
    #                 reads stay in DMA'd (finite) data at the segment tail
    KT = K * T
    # target slab width: +CW alignment slack, rounded to a 128-lane
    # multiple (tpu.dynamic_rotate requires an aligned lane dimension)
    TW = _round_up(KT + CW, 128)

    def dma(gg, buf, p):
        ws = gws_s[gg * PD + p]
        al = pl.multiple_of((ws // CW) * CW, CW)
        return pltpu.make_async_copy(
            sf_ref.at[:, pl.ds(al, WP)],
            cwin.at[buf, p], sem.at[buf, p])

    def tdma(gg, buf):
        b0 = gblk_s[gg * K]
        al = pl.multiple_of(((b0 * T) // CW) * CW, CW)
        return pltpu.make_async_copy(
            sf_ref.at[:, pl.ds(al, TW)], tbuf.at[buf], tsem.at[buf])

    # DSPH_ABLATE profiling knob (see interaction_forces_rows_v3): ""
    # = full kernel; "nophys" = pair bodies replaced by a 1-element touch
    # (DMAs + control flow intact); "noseg" = segment loops skipped (DMAs +
    # target transpose only); "nodma" = window DMAs skipped (stale scratch);
    # "grid" = everything skipped (pure grid/output-copy overhead).
    win_dma = ablate not in ("nodma", "grid")
    tgt_dma = ablate != "grid"

    def issue(gg, buf):
        @pl.when(gskip_s[gg] == 0)
        def _():
            if tgt_dma:
                tdma(gg, buf).start()
            if win_dma:
                for p in range(PD):
                    @pl.when(gwc_s[gg * PD + p] > 0)
                    def _(p=p):
                        dma(gg, buf, p).start()

    if NBUF == 2:
        @pl.when(g == 0)
        def _():
            issue(0, 0)

        @pl.when(g + 1 < NG)
        def _():
            issue(g + 1, (g + 1) % 2)
        buf = g % 2
    else:
        issue(g, 0)
        buf = 0

    @pl.when(gskip_s[g] == 0)
    def _():
        if tgt_dma:
            tdma(g, buf).wait()
        if win_dma:
            for p in range(PD):
                @pl.when(gwc_s[g * PD + p] > 0)
                def _(p=p):
                    dma(g, buf, p).wait()

    if ablate == "grid":
        for kk in range(K):
            store(kk, jnp.zeros((T, CO), jnp.float32))
        return

    # group targets: roll the slab so lane 0 = block gblk0's first row,
    # then ONE (C, K*T) -> (K*T, C) transpose shared by the K blocks
    b0 = gblk_s[g * K]
    tsh = b0 * T - ((b0 * T) // CW) * CW
    tall = pltpu.roll(tbuf[buf], jax.lax.rem(jnp.int32(TW) - tsh,
                                             jnp.int32(TW)), axis=1)
    tgt_all = jnp.transpose(tall[:, :KT], (1, 0))        # (K*T, C)

    def tgt_get(kk):
        return tgt_all[kk * T:(kk + 1) * T, :]

    if ablate == "nophys":
        def make_phys(kk):
            init = (jnp.zeros((T, CO), jnp.float32),)

            def chunk_fn(cw, clanev, accs):
                # touch one row of the slab + mask so neither DMA nor the
                # chunk control flow can be dead-code-eliminated (sublane
                # broadcast only; lane dim already CO-wide)
                t = cw[:1, :CO] + clanev[:1, :CO].astype(jnp.float32)
                return (accs[0] + t,)

            return init, chunk_fn, lambda accs: accs[0]
    elif fast:
        make_phys = _make_phys_v4(tgt_get, csp, opts, T=T, CW=CW, CO=CO)
    else:
        make_phys = _make_phys_v3(tgt_get, visco_s, csp, opts, T=T, CW=CW,
                                  CO=CO)
    skip = gskip_s[g] != 0
    if ablate == "noseg":
        for kk in range(K):
            @pl.when(skip)
            def _(kk=kk):
                store(kk, jnp.zeros((T, CO), jnp.float32))

            @pl.when(~skip)
            def _(kk=kk):
                # keep the target transpose live, skip all segment work
                store(kk, jnp.zeros((T, CO),
                                     jnp.float32) + tgt_get(kk)[:, :1])
        return
    for kk in range(K):
        @pl.when(skip)
        def _(kk=kk):
            store(kk, jnp.zeros((T, CO), jnp.float32))

        @pl.when(~skip)
        def _(kk=kk):
            init, chunk_fn, finish = make_phys(kk)

            if flat:
                # branch-free segment sweep: ONE fori_loop over the block's
                # precomputed chunk-descriptor list (celldiv packs plane,
                # 128-aligned base, rotate amount and valid count into one
                # i32 per chunk) — replaces the per-segment cond nests whose
                # scalar-branch latency measured ~110 cycles/chunk.
                # Unrolled x2: the odd chunk is guarded by a LANE MASK (not
                # a branch); invalid descriptors decode to a masked-off
                # in-bounds plane-0 slab, so the over-read is safe.
                nch = chn_s[g * K + kk]

                def chunk_i(i, acc, guard, valid=None):
                    # layout: p(4) | off0(7) | vcm1(7) | base//128(7)
                    if valid is not None:
                        # guarded chunks can have i >= nch: reading there is
                        # the NEXT block's descriptor (OOB slab address when
                        # that block is wide — the r4 advisor finding) or,
                        # if zeroed, a possibly never-DMA'd plane-0 slab
                        # whose stale rho=0 garbage turns the multiplicative
                        # lane mask into 0*inf = NaN.  Re-read the block's
                        # LAST VALID descriptor instead: in-bounds, real
                        # window data, and the guard masks every lane.
                        i = jnp.minimum(i, nch - 1)
                    d = desc_s[(g * K + kk) * MC + i]
                    base = (d & 0x7f) * CW
                    vcm1 = (d >> 7) & 0x7f
                    off0 = (d >> 14) & 0x7f
                    p = d >> 21
                    ramt = (2 * CW - off0) & (2 * CW - 1)
                    slab = cwin[buf, p, :,
                                pl.ds(pl.multiple_of(base, CW), 2 * CW)]
                    cw2 = pltpu.roll(slab, ramt, axis=1)
                    clanev = lane0 <= vcm1
                    if guard is not None:
                        clanev = clanev & guard
                    return chunk_fn(cw2[:, :CW], clanev, acc)

                # DSPH_FUNROLL chunks per loop iteration: deeper unroll
                # amortizes loop control and gives the scheduler independent
                # rsqrt/recip chains to interleave; chunks past nch are
                # guard-masked (they still run their pair body, so going too
                # deep wastes ~(U - nch%U)/nch of the pair ALU).  Measured on
                # the 267k bench (abkern, r5): FU=1 22.1 ms/interaction,
                # FU=2 18.3, FU=4 16.9 -> default 4.
                FU = _env_int("DSPH_FUNROLL", 4, choices=(1, 2, 4, 8))

                def tup_i(j, acc):
                    acc = chunk_i(FU * j, acc, None)
                    for t in range(1, FU):
                        v = FU * j + t < nch
                        acc = chunk_i(FU * j + t, acc, v, valid=v)
                    return acc

                store(kk, finish(jax.lax.fori_loop(
                    0, (nch + FU - 1) // FU, tup_i, init)))
                return

            # dynamic loop over the R segments (the chunk body is heavy —
            # keeping it traced once per unroll slot instead of once per
            # (segment, slot) cuts Mosaic compile time ~R-fold)
            def seg_body(r, accs):
                off = soff_s[(g * K + kk) * R + r]
                wc = swc_s[(g * K + kk) * R + r]
                if roll:
                    # roll-aligned chunks: chunk v covers segment lanes
                    # [v*CW, (v+1)*CW); the aligned 2*CW slab is rotated so
                    # lane 0 = segment lane v*CW (see _kernel_v3 docstring)
                    base0 = (off // CW) * CW
                    ramt = jax.lax.rem(jnp.int32(2 * CW) - (off - base0),
                                       jnp.int32(2 * CW))

                    def chunk(v, acc):
                        base = pl.multiple_of(base0 + v * CW, CW)
                        slab = cwin[buf, r // RP, :, pl.ds(base, 2 * CW)]
                        cw2 = pltpu.roll(slab, ramt, axis=1)
                        clanev = (lane0 + v * CW) < wc   # tail guard only
                        return chunk_fn(cw2[:, :CW], clanev, acc)

                    def from_j(j, acc):
                        if j >= min(UNROLL, MAXCH):
                            if MAXCH <= UNROLL:
                                return acc
                            nch = jax.lax.div(wc + CW - 1, jnp.int32(CW))

                            def tail(a):
                                return jax.lax.fori_loop(j, nch, chunk, a)
                            return jax.lax.cond(wc > j * CW, tail,
                                                lambda a: a, acc)

                        def more(a):
                            return from_j(j + 1, chunk(j, a))
                        return jax.lax.cond(wc > j * CW, more,
                                            lambda a: a, acc)

                    return from_j(0, accs)

                c0 = off // CW
                hi = off + wc

                def chunk(ci, acc):
                    base = pl.multiple_of(ci * CW, CW)
                    slab = cwin[buf, r // RP, :, pl.ds(base, CW)]
                    lane = lane0 + base
                    clanev = (lane >= off) & (lane < hi)
                    return chunk_fn(slab, clanev, acc)

                # first chunks unrolled as nested conds (typ. 1-3 occupied),
                # fori tail for the rare long segment
                def from_j(j, acc):
                    if j >= min(UNROLL, MAXCH):
                        if MAXCH <= UNROLL:
                            return acc
                        nch = jax.lax.div(hi - c0 * CW + CW - 1,
                                          jnp.int32(CW))

                        def tail(a):
                            return jax.lax.fori_loop(c0 + UNROLL, c0 + nch,
                                                     chunk, a)
                        return jax.lax.cond((c0 + j) * CW < hi, tail,
                                            lambda a: a, acc)

                    def more(a):
                        return from_j(j + 1, chunk(c0 + j, a))
                    cnd = wc > 0 if j == 0 else (c0 + j) * CW < hi
                    return jax.lax.cond(cnd, more, lambda a: a, acc)

                return from_j(0, accs)

            accs = jax.lax.fori_loop(0, R, seg_body, init)
            store(kk, finish(accs))


def interaction_forces_rows_v3(csp: CteSph, opts: SolverOpts, dom: cd.Domain,
                               rd: "cd.RowDiv", pos, vel, rho, code,
                               ftomassp=None, interpret=False, visco=None,
                               ddtkh=None) -> Forces:
    """Fused v3 kernel over the row-padded layout with trimmed windows (see
    _kernel_v3).  Same contract as interaction_forces_rows; requires the
    group tables built by divide_rows(..., v3=v3_params(dom, NP))."""
    NP = rd.ncap
    T = tblock()
    A = NP // T
    prm = v3_params(dom, NP)
    K, WU, WW, CAPW = prm["K"], prm["WU"], prm["WW"], prm["CAPW"]
    MC = prm["MC"]
    GCAP = cd.v3_gcap(dom, A, K)
    R = rd.wstart.shape[1]
    PD = rd.gws.shape[1]          # DMA planes (merged dz planes or per-row)
    CO = co_for(opts)
    C = c_for(opts)
    fast = use_fast_body(csp, opts)
    roll = use_roll()

    if fast:
        chans, ikind = _fast_channels(csp, opts, dom, NP, pos, vel, rho,
                                      code, ftomassp, visco, ddtkh)
    else:
        act = td.is_active(code)
        ikind = td.code_type(code)
        kind = ikind.astype(jnp.float32)
        px = jnp.where(act, pos[:, 0],
                       jnp.float32(dom.posmin[0] - 20.0 * dom.scell))
        rho_s = jnp.where(act, rho, 1.0)
        vel_s = jnp.where(act[:, None], vel, 0.0)
        press = jnp.where(act, _press(csp, rho_s), 0.0)
        mass = jnp.where(ikind >= td.TYPE_FLUID, csp.massfluid,
                         csp.massbound).astype(jnp.float32)
        if ftomassp is not None:
            mass = jnp.where(ikind == td.TYPE_FLOATING,
                             jnp.take(jnp.asarray(ftomassp, jnp.float32),
                                      td.code_value(code), mode="clip"),
                             mass)
        chans = [px, pos[:, 1], pos[:, 2], vel_s[:, 0], vel_s[:, 1],
                 vel_s[:, 2], rho_s, press, 1.0 / rho_s, kind, mass]
    packed = jnp.stack(chans, axis=0)
    packed = jnp.pad(packed, ((0, C - packed.shape[0]), (0, 0)))
    # single copy; the tail pad covers the widest floored-start DMA overrun
    # (and the target-slab DMA: WW >= K*T for every valid DSPH_K)
    sf = jnp.pad(packed, ((0, 0), (0, WW + CW)))

    viscov = jnp.stack([
        jnp.asarray(csp.visco if visco is None else visco, jnp.float32),
        jnp.asarray(csp.ddtkh if ddtkh is None else ddtkh, jnp.float32)])

    def run(tables, NG, W, NBUF, flat=False):
        """One pallas call over NG groups; returns (NG, K, T, CO) blocks in
        group-slot order."""
        gblk, gskip, gws, gwc, soff, swc, desc, chn = tables
        # don't ship SMEM tables the kernel generation won't read: the flat
        # path uses desc/chn only, the legacy path soff/swc only
        dummy = jnp.zeros((8,), jnp.int32)
        if flat:
            soff = swc = dummy
        else:
            desc = chn = dummy
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(NG,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec((1, T, K * CO), lambda a, *_: (a, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[
                pltpu.VMEM((NBUF, PD, C, W + CW), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF, PD)),
                pltpu.VMEM((NBUF, C, _round_up(K * T + CW, 128)),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        )
        kern = functools.partial(_kernel_v3, csp=csp, opts=opts, R=R, T=T,
                                 W=W, CW=CW, CO=CO, C=C, K=K, NG=NG,
                                 NBUF=NBUF, PD=PD, fast=fast, roll=roll,
                                 UNROLL=2 if roll else 4, MC=MC, flat=flat,
                                 ablate=os.environ.get("DSPH_ABLATE", ""))
        call = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((NG, T, K * CO), jnp.float32)],
            interpret=interpret,
        )
        # +8 pad: the unrolled flat loop reads one descriptor past chn,
        # which for the last block of the last group is one past the table
        out, = call(gblk.reshape(-1), gskip, gws.reshape(-1),
                    gwc.reshape(-1), soff.reshape(-1), swc.reshape(-1),
                    jnp.pad(desc.reshape(-1), (0, 8)), chn.reshape(-1),
                    viscov, sf)
        # (NG, T, K, CO) -> (NG, K, T, CO)
        return out.reshape(NG, T, K, CO).transpose(0, 2, 1, 3)

    def chunked(tables, NTOT, W, NBUF, CH, live, flat=False,
                always_first=True):
        """Chunk the group axis so the scalar tables fit SMEM; whole chunks
        beyond the live-group prefix skip at runtime.  The chunks run under
        ``lax.map`` so the pallas call is TRACED ONCE no matter how many
        chunks the group count needs — at 10M particles the narrow table
        spans ~120 chunks, which as an unrolled Python loop would compile
        ~120 copies of the kernel."""
        CH = min(CH, _round_up(NTOT, 8))
        nchunk = -(-NTOT // CH)
        # balance the last chunk: same chunk count, minimal group padding
        # (1190 groups at CH=512 would otherwise pad to 1536 grid steps)
        CH = _round_up(-(-NTOT // nchunk), 8)
        padg = nchunk * CH - NTOT

        def p(t):
            return jnp.pad(t, ((0, padg),) + ((0, 0),) * (t.ndim - 1),
                           constant_values=1 if t.ndim == 1 else 0)

        tabs8 = tuple(p(t) for t in tables)
        # padding groups: skip flag 1 (gskip padded with 1), block sentinel 0
        # is fine — skipped groups write zeros and fetch nothing
        if nchunk == 1:
            return run(tabs8, CH, W, NBUF, flat)[:NTOT]

        def rs(t):
            return t.reshape((nchunk, CH) + t.shape[1:])

        xs = (tuple(rs(t) for t in tabs8),
              jnp.arange(nchunk, dtype=jnp.int32) * CH)

        def body(x):
            tabs, base = x
            if interpret:
                return run(tabs, CH, W, NBUF, flat)
            # whole chunks beyond the live-group prefix skip at runtime
            keep = (live > base) | (base == 0) if always_first \
                else live > base
            return jax.lax.cond(
                keep,
                lambda t=tabs: run(t, CH, W, NBUF, flat),
                lambda: jnp.zeros((CH, K, T, CO), jnp.float32))

        out = jax.lax.map(body, xs)
        return out.reshape((nchunk * CH,) + out.shape[2:])[:NTOT]

    narrow_tabs = (rd.gblk, rd.gwide, rd.gws, rd.gwc, rd.soff, rd.swc,
                   rd.desc, rd.chn)
    GCH = _env_int("DSPH_GCHUNK", 512, mult=8)
    # narrow groups run the branch-free descriptor loop (requires roll);
    # wide groups keep the legacy per-segment sweep (their bases exceed the
    # descriptor's 14-bit field)
    flat = roll and os.environ.get("DSPH_FLAT", "1") == "1"
    outN = chunked(narrow_tabs, GCAP, WU, 2, GCH, rd.ngrp, flat=flat)

    # wide fallback: gather the wide groups' tables compactly
    wl = rd.widelist
    wlc = jnp.minimum(wl, GCAP - 1)
    validw = wl < GCAP
    vw2 = validw[:, None]
    wide_tabs = (jnp.where(vw2, rd.gblk[wlc], A),
                 jnp.where(validw, 0, 1).astype(jnp.int32),
                 jnp.where(vw2, rd.gws[wlc], 0),
                 jnp.where(vw2, rd.gwc[wlc], 0),
                 jnp.where(vw2, rd.soff[wlc], 0),
                 jnp.where(vw2, rd.swc[wlc], 0),
                 jnp.where(vw2, rd.desc[wlc], 0),
                 jnp.where(vw2, rd.chn[wlc], 0))
    # the wide fallback normally has nothing to do (nwide==0 at the bench
    # configs once WU covers the merged-plane unions): skip the whole call
    outW = jax.lax.cond(
        rd.nwide > 0,
        lambda: chunked(wide_tabs, CAPW, WW, 1, min(128, GCH), rd.nwide,
                        always_first=False),
        lambda: jnp.zeros((CAPW, K, T, CO), jnp.float32))

    allout = jnp.concatenate([
        outN.reshape(GCAP * K, T, CO),
        outW.reshape(CAPW * K, T, CO),
        jnp.zeros((1, T, CO), jnp.float32)], axis=0)
    canon = jnp.take(allout, rd.inv, axis=0).reshape(A * T, CO)
    return _forces_from_canon(csp, opts, canon, ikind)


def _press(csp, rho):
    """Tait EOS inline (FunSphEos.h:38-40): b*((rho/rho0)^7 - 1) via cheap
    multiplies (gamma=7 fast path) or pow."""
    rr = rho * jnp.float32(1.0 / csp.rhopzero)
    if abs(csp.gamma - 7.0) < 1e-9:
        r2 = rr * rr
        r7 = r2 * r2 * r2 * rr
    else:
        r7 = rr ** jnp.float32(csp.gamma)
    return jnp.float32(csp.cteb) * (r7 - 1.0)


def interaction_forces_pallas(csp: CteSph, opts: SolverOpts, dom: cd.Domain,
                              sd: cd.SortDiv, pos, vel, rho, code,
                              ftomassp=None, state_sorted=False,
                              interpret=False, visco=None,
                              spstau=None, ddtkh=None) -> Forces:
    """Run the fused kernel and return canonical-order Forces (same contract
    as ops.forces.interaction_forces).

    ``state_sorted``: the caller already permuted the particle arrays into
    the divide's sort order (models.wcsph does this once per step) — the
    packed-field gather and the canonical-order scatter both disappear,
    which removes the two big XLA random-access passes per interaction."""
    n = sd.ncap
    A = sd.tstart.shape[0]
    R = sd.wstart.shape[1]
    T, W = tiles_for(dom)
    CO = co_for(opts)
    C = c_for(opts)
    use_sps = opts.tvisco == TpVisco.LAMINAR_SPS

    ikind = td.code_type(code)
    kind = ikind.astype(jnp.float32)
    press = _press(csp, rho)
    mass = jnp.where(ikind >= td.TYPE_FLUID, csp.massfluid,
                     csp.massbound).astype(jnp.float32)
    if ftomassp is not None:
        mass = jnp.where(ikind == td.TYPE_FLOATING,
                         jnp.take(jnp.asarray(ftomassp, jnp.float32),
                                  td.code_value(code), mode="clip"), mass)
    chans = [pos[:, 0], pos[:, 1], pos[:, 2], vel[:, 0], vel[:, 1],
             vel[:, 2], rho, press, 1.0 / rho, kind, mass]
    if use_sps:
        tau = (spstau if spstau is not None
               else jnp.zeros((n, 6), jnp.float32))
        chans += [tau[:, i] for i in range(6)]
    packed = jnp.stack(chans, axis=0)
    packed = jnp.pad(packed, ((0, C - packed.shape[0]), (0, 0)))
    sf = packed if state_sorted else packed[:, sd.order]
    # NSHIFT right-shifted copies (see row_sched): copy k pads k*GSHIFT dead
    # lanes in front; +CW guards the aligned-start overrun of stage-A DMAs
    sf = jnp.stack([jnp.pad(sf, ((0, 0), (k * GSHIFT,
                                          W + CW - k * GSHIFT)))
                    for k in range(NSHIFT)], axis=0)

    # target tiles (A, T, C) — contiguous sorted rows per cell
    tidx = sd.tstart[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    tidx = jnp.minimum(tidx, n - 1 + W)
    tgt = jnp.transpose(sf[0], (1, 0))[tidx]        # (A, T, C)

    # chunk the cell grid so each call's scalar-prefetch tables fit SMEM
    # (A*(1+3R)*4 bytes must stay well under the 1 MB scalar memory)
    CA = min(_round_up(A, 8), 8192)
    nchunk = -(-A // CA)
    Apad = nchunk * CA
    padA = Apad - A
    tcount = jnp.pad(sd.tcount, (0, padA))
    wstart = jnp.pad(sd.wstart + sd.woff, ((0, padA), (0, 0)))
    wcount = jnp.pad(sd.wcount, ((0, padA), (0, 0)))
    tgt = jnp.pad(tgt, ((0, padA), (0, 0), (0, 0)))

    viscov = jnp.stack([
        jnp.asarray(csp.visco if visco is None else visco, jnp.float32),
        jnp.asarray(csp.ddtkh if ddtkh is None else ddtkh, jnp.float32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(CA,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda a, *_: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, T, CO), lambda a, *_: (a, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, C, W), jnp.float32),
            pltpu.SemaphoreType.DMA((R, 2)),
        ],
    )
    kern = functools.partial(_kernel, csp=csp, opts=opts, R=R, T=T, W=W,
                             CW=CW, CO=CO, C=C)
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CA, T, CO), jnp.float32),
        interpret=interpret,
    )
    outs = []
    for c in range(nchunk):
        sl = slice(c * CA, (c + 1) * CA)
        args = (tcount[sl], wstart[sl].reshape(-1),
                wcount[sl].reshape(-1), viscov, tgt[sl], sf)
        if c == 0 or interpret:
            outs.append(call(*args))
        else:
            # active cells are packed to the front (runid order): whole
            # chunks beyond nactive skip at runtime
            outs.append(jax.lax.cond(
                sd.nactive > c * CA,
                lambda a=args: call(*a),
                lambda: jnp.zeros((CA, T, CO), jnp.float32)))
    out = jnp.concatenate(outs, axis=0)[:A] if nchunk > 1 else outs[0][:A]

    # map (A, T) tiles back: sorted row i of cell slot s, rank k -> out[s,k]
    # build per-sorted-row (slot*T + rank) index
    flat = out.reshape(A * T, CO)
    import numpy as np
    sorted_out = jnp.take(flat, sd.srow, axis=0,
                          mode="fill", fill_value=np.float32(0.0))
    canon = (sorted_out if state_sorted
             else jnp.zeros((n, CO), jnp.float32).at[sd.order].set(sorted_out))

    return _forces_from_canon(csp, opts, canon, ikind)


def _forces_from_canon(csp, opts, canon, ikind):
    """Slice the canonical-order (n, CO) kernel output into Forces."""
    use_sps = opts.tvisco == TpVisco.LAMINAR_SPS
    ace = canon[:, _OAX:_OAZ + 1]
    if csp.simulate2d:
        ace = ace.at[:, 1].set(0.0)
    ar = canon[:, _OAR]
    if opts.tdensity != TpDensity.NONE:
        ar = ar + jnp.where(canon[:, _ODBLK] > 0, 0.0, canon[:, _ODELTA])
    viscdtmax = jnp.maximum(jnp.max(canon[:, _OVISC]), 0.0)
    shiftposfs = shift_blocked = None
    if opts.shiftmode.value != 0:
        shiftposfs = canon[:, _OSHX:_OSHC + 1]
        shift_blocked = (canon[:, _OSHB] > 0) | (ikind == td.TYPE_FLOATING)
    spsgradvel = None
    if use_sps:
        gbase = 7 + (5 if opts.shiftmode.value != 0 else 0)
        spsgradvel = canon[:, gbase:gbase + 6]
    return Forces(ace=ace, ar=ar, viscdtmax=viscdtmax, shiftposfs=shiftposfs,
                  shift_blocked=shift_blocked, spsgradvel=spsgradvel)


def interaction_forces_rows(csp: CteSph, opts: SolverOpts, dom: cd.Domain,
                            rd: "cd.RowDiv", pos, vel, rho, code,
                            ftomassp=None, interpret=False, visco=None,
                            spstau=None, ddtkh=None) -> Forces:
    """Fused kernel over the row-padded layout (celldiv.RowDiv).

    The state arrays are ALREADY in padded-slot order (the amortized-rebuild
    contract, models.wcsph): block b's targets are rows [b*T, (b+1)*T) of the
    packed matrix, so the target tiles are a free blocked reshape and the
    (NP, CO) kernel output IS the force array — the per-interaction target
    gather and srow scatter of the SortDiv path do not exist here.

    Dead slots (padding, or particles excluded since the last rebuild) are
    neutralized in the packed build: x is poisoned 20 cells outside the map
    (fails the rr2 cutoff while keeping every kernel polynomial finite) and
    vel/rho are sanitized so 0*NaN can never leak into live lanes."""
    if rd.gblk is not None:
        if not v3_ok(csp, opts):
            raise NotImplementedError(
                "v3 divide tables built for a config the v3 kernel does not "
                "cover — build the divide with v3=None for the v1 kernel")
        return interaction_forces_rows_v3(
            csp, opts, dom, rd, pos, vel, rho, code, ftomassp=ftomassp,
            interpret=interpret, visco=visco, ddtkh=ddtkh)
    NP = rd.ncap
    T, W = tiles_rows(dom)
    A = NP // T
    R = rd.wstart.shape[1]
    CO = co_for(opts)
    C = c_for(opts)
    use_sps = opts.tvisco == TpVisco.LAMINAR_SPS

    act = td.is_active(code)
    ikind = td.code_type(code)
    kind = ikind.astype(jnp.float32)
    px = jnp.where(act, pos[:, 0],
                   jnp.float32(dom.posmin[0] - 20.0 * dom.scell))
    rho_s = jnp.where(act, rho, 1.0)
    vel_s = jnp.where(act[:, None], vel, 0.0)
    press = jnp.where(act, _press(csp, rho_s), 0.0)
    invr = 1.0 / rho_s
    mass = jnp.where(ikind >= td.TYPE_FLUID, csp.massfluid,
                     csp.massbound).astype(jnp.float32)
    if ftomassp is not None:
        mass = jnp.where(ikind == td.TYPE_FLOATING,
                         jnp.take(jnp.asarray(ftomassp, jnp.float32),
                                  td.code_value(code), mode="clip"), mass)
    chans = [px, pos[:, 1], pos[:, 2], vel_s[:, 0], vel_s[:, 1],
             vel_s[:, 2], rho_s, press, invr, kind, mass]
    if use_sps:
        tau = (spstau if spstau is not None
               else jnp.zeros((NP, 6), jnp.float32))
        chans += [jnp.where(act, tau[:, i], 0.0) for i in range(6)]
    packed = jnp.stack(chans, axis=0)
    packed = jnp.pad(packed, ((0, C - packed.shape[0]), (0, 0)))
    sf = jnp.stack([jnp.pad(packed, ((0, 0), (k * GSHIFT,
                                              W + CW - k * GSHIFT)))
                    for k in range(NSHIFT)], axis=0)
    tgt = jnp.transpose(packed, (1, 0)).reshape(A, T, C)

    # K consecutive blocks per grid step (grid overhead shared, the K*R
    # window DMAs issue up front and overlap earlier blocks' pair math);
    # K must divide the 8-aligned chunk size
    K = kblocks()
    CA = min(_round_up(A, max(8, K)), 8192)
    nchunk = -(-A // CA)
    padA = nchunk * CA - A
    tcount = jnp.pad(rd.tcount, (0, padA))
    wstart = jnp.pad(rd.wstart, ((0, padA), (0, 0)))
    wcount = jnp.pad(rd.wcount, ((0, padA), (0, 0)))
    tgt = jnp.pad(tgt, ((0, padA), (0, 0), (0, 0)))

    viscov = jnp.stack([
        jnp.asarray(csp.visco if visco is None else visco, jnp.float32),
        jnp.asarray(csp.ddtkh if ddtkh is None else ddtkh, jnp.float32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(CA // K,),
        in_specs=[
            pl.BlockSpec((K, T, C), lambda a, *_: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((K, T, CO), lambda a, *_: (a, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K * R, C, W), jnp.float32),
            pltpu.SemaphoreType.DMA((K * R, 2)),
        ],
    )
    kern = functools.partial(_kernel, csp=csp, opts=opts, R=R, T=T, W=W,
                             CW=CW, CO=CO, C=C, SA=sa_chunks(dom, W), K=K)
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CA, T, CO), jnp.float32),
        interpret=interpret,
    )
    outs = []
    for c in range(nchunk):
        sl = slice(c * CA, (c + 1) * CA)
        args = (tcount[sl], wstart[sl].reshape(-1),
                wcount[sl].reshape(-1), viscov, tgt[sl], sf)
        if c == 0 or interpret:
            outs.append(call(*args))
        else:
            # active blocks form the prefix [0, used/T): whole chunks beyond
            # skip at runtime
            outs.append(jax.lax.cond(
                jnp.reshape(rd.nactive, ()) > c * CA,
                lambda a=args: call(*a),
                lambda: jnp.zeros((CA, T, CO), jnp.float32)))
    out = jnp.concatenate(outs, axis=0)[:A] if nchunk > 1 else outs[0][:A]
    canon = out.reshape(A * T, CO)
    return _forces_from_canon(csp, opts, canon, ikind)


