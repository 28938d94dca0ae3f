"""Fixed-shape cell division (neighbour structure) for TPU.

TPU-native re-design of the reference's cell-linked-list layer
(`/root/reference/src/source/JCellDivCpu*.cpp`, `JCellDivGpu*_ker.cu`):
instead of a counting sort into variable-length per-cell ranges
(`JCellDivCpuSingle.cpp:276`, thrust radix sort `JCellDivGpu_ker.cu:116-121`),
particles are binned into a *static-shape* structure each step:

* particles are sorted by linear cell id (x-fastest, like `JDsDcell`),
* non-empty cells are compacted into an **active-cell table** of static
  capacity ``A`` (the analog of the reference's shrink-wrapped cell domain,
  `JCellDivCpuSingle.cpp:45-121` — empty space costs nothing),
* each active cell gets a **fixed-capacity bucket** of ``K`` particle slots,
* each active cell precomputes the active-slot ids of its 27 (3D) / 9 (2D)
  neighbour cells, so the force pass is a fully static gather
  (the analog of `JCellSearch_inline.h:33-92` neighbour ranges).

Everything is jit-compatible: no dynamic shapes, overflow is *counted* and
surfaced as a diagnostic instead of resized (the reference's retry-on-overflow
resize `JSphCpuSingle.cpp:393-407` becomes "provision capacity, fail loudly").

Canonical particle arrays are never reordered (ids are stable); the bucket
table holds indices into the canonical arrays.  Sentinels: particle index
``n`` (capacity) marks an empty bucket slot; active-slot ``A`` marks a
missing neighbour cell (row ``A`` of the bucket table is all-sentinel).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from .. import typesdef as td


@dataclass(frozen=True)
class Domain:
    """Static cell-grid geometry (reference map/cell config, `JSph::ConfigCellDivision`
    `JSph.cpp:1772` + `JDsDcell` packing). ``scell`` = KernelSize (full cell mode,
    `TpCellMode` `DualSphDef.h:477`)."""
    posmin: tuple            # (x,y,z) map lower corner
    scell: float             # cell width (= kernelsize for full mode)
    nc: tuple                # (ncx, ncy, ncz) cell counts
    simulate2d: bool = False
    cellcap: int = 32        # K: max particles per cell bucket
    maxcells: int = 0        # A: active-cell capacity (0 = auto)

    @property
    def ncells(self) -> int:
        return self.nc[0] * self.nc[1] * self.nc[2]

    @property
    def posmax(self) -> tuple:
        return tuple(self.posmin[i] + self.nc[i] * self.scell for i in range(3))

    @property
    def nneigh(self) -> int:
        return 9 if self.simulate2d else 27

    def neigh_offsets(self):
        """Static list of (dx,dy,dz) neighbour-cell offsets."""
        dys = (0,) if self.simulate2d else (-1, 0, 1)
        return [(dx, dy, dz) for dz in (-1, 0, 1) for dy in dys for dx in (-1, 0, 1)]


def make_domain(posmin, posmax, kernelsize, *, simulate2d=False, dp=0.0,
                cellcap=0, maxcells=0, borders=0.0, skin=0.0) -> Domain:
    """Build the static cell grid covering [posmin-borders, posmax+borders].

    The reference computes map limits from loaded particles plus a KernelSize
    halo (`JSph::LoadCaseParticles`, `JSph.cpp:2036-2081`); here the grid is
    frozen at trace time (the `-cellfixed`/`CellDomFixed` behaviour,
    `DualSphDef.h` — dynamic shrink-wrap is a later optimization).

    ``skin`` inflates the cell size to kernelsize*(1+skin): cells then cover
    every pair up to ``skin*kernelsize`` of total particle displacement, the
    Verlet-list contract that lets the amortized-rebuild path (RowDiv) reuse
    one divide for many steps.  Candidate volume grows by ~(1+skin)^3, so
    keep it small (~1/16).

    ``cellcap`` (K) defaults to the exact worst case for a dp-lattice: a cube
    of side scell holds at most (floor(scell/dp)+1)^dim lattice points;
    WCSPH compression is ~1% so this bound holds throughout a run.
    """
    posmin = tuple(float(p) - borders for p in posmin)
    posmax = tuple(float(p) + borders for p in posmax)
    scell = float(kernelsize) * (1.0 + skin)
    nc = tuple(max(1, int(math.ceil((posmax[i] - posmin[i]) / scell)))
               for i in range(3))
    if simulate2d:
        nc = (nc[0], 1, nc[2])
    if not cellcap:
        dim = 2 if simulate2d else 3
        if dp:
            cellcap = int(math.floor(scell / dp) + 1) ** dim + 4
        else:
            cellcap = 20 if simulate2d else 68
    return Domain(posmin=posmin, scell=scell, nc=nc,
                  simulate2d=simulate2d, cellcap=cellcap, maxcells=maxcells)


@jax.tree_util.register_dataclass
@dataclass
class DivData:
    """Result of a cell division; consumed by every interaction pass
    (the analog of the reference ``StDivDataCpu/Gpu``)."""
    bucket_idx: jax.Array    # (A+1, K) int32: canonical particle index or n (sentinel); row A = all-sentinel
    neigh_slot: jax.Array    # (A, NN) int32: active slot of each neighbour cell, or A
    cell_slot: jax.Array     # (ncells+1,) int32: cell id -> active slot, or A
    nactive: jax.Array       # () int32: number of non-empty cells
    overflow: jax.Array      # () int32: particles dropped (bucket K or table A overflow); MUST be 0
    # static metadata
    ncap: int = field(metadata=dict(static=True), default=0)   # n: particle capacity


def cell_coords(dom: Domain, pos, origin=None):
    """Integer cell coordinates of each position (may be out of range).
    ``origin`` (traced) overrides the static grid anchor — used by domain
    sharding (per-shard slab origins) and, later, dynamic shrink-wrap."""
    if origin is None:
        origin = jnp.asarray(dom.posmin, dtype=pos.dtype)
    rel = (pos - origin) * (1.0 / dom.scell)
    return jnp.floor(rel).astype(jnp.int32)


def divide(dom: Domain, pos, code, origin=None):
    """Bin particles into the fixed-shape cell structure.

    Returns ``(DivData, new_code)`` where ``new_code`` marks formerly-normal
    particles that left the map as OUT_POS (the reference marks these during
    position update, `JSphCpu::UpdatePos`, and compacts them out in
    `JCellDivCpu`; here they simply stop participating).
    """
    n = pos.shape[0]
    ncells = dom.ncells
    K = dom.cellcap
    A = dom.maxcells or min(ncells, n)
    ncx, ncy, ncz = dom.nc

    cxyz = cell_coords(dom, pos, origin)
    inside = jnp.all((cxyz >= 0) & (cxyz < jnp.array(dom.nc, jnp.int32)), axis=1)
    active = td.is_active(code)
    # mark escaped actives as out-pos
    newly_out = active & ~inside
    new_code = jnp.where(newly_out, td.code_set_special(code, td.SPECIAL_OUT_POS), code)
    live = active & inside

    cellid = (cxyz[:, 2] * ncy + cxyz[:, 1]) * ncx + cxyz[:, 0]
    cellid = jnp.where(live, cellid, ncells)  # dead particles sort to the end

    # sort particles by cell id (the analog of the counting/radix sort,
    # JCellDivGpu_ker.cu:116-121); stable so results are deterministic.
    scid, order = jax.lax.sort_key_val(
        cellid, jnp.arange(n, dtype=jnp.int32), is_stable=True)

    # run detection over the sorted cell ids
    prev = jnp.concatenate([jnp.full((1,), -1, scid.dtype), scid[:-1]])
    newrun = scid != prev
    runid = jnp.cumsum(newrun.astype(jnp.int32)) - 1          # active slot per particle
    iarange = jnp.arange(n, dtype=jnp.int32)
    runstart = jax.lax.cummax(jnp.where(newrun, iarange, 0))
    rank = iarange - runstart                                  # rank within the cell

    svalid = scid < ncells
    nactive = jnp.sum((newrun & svalid).astype(jnp.int32))

    # bucket table (A+1, K): row A stays all-sentinel for missing neighbours
    in_bucket = svalid & (rank < K) & (runid < A)
    brow = jnp.where(in_bucket, runid, A)
    bcol = jnp.where(in_bucket, rank, 0)
    bucket_idx = jnp.full((A + 1, K), n, jnp.int32)
    bucket_idx = bucket_idx.at[brow, bcol].set(
        jnp.where(in_bucket, order, n).astype(jnp.int32), mode="drop")
    # row A may have been written by the A-sentinel path with value n already (fine)
    overflow = jnp.sum((svalid & ~in_bucket).astype(jnp.int32))

    # active cell table: cell id per active slot
    run_ok = newrun & svalid & (runid < A)
    slot_of_run = jnp.where(run_ok, runid, A)
    active_cell = jnp.full((A,), ncells, jnp.int32)
    active_cell = active_cell.at[slot_of_run].set(
        jnp.where(run_ok, scid, ncells).astype(jnp.int32), mode="drop")

    # dense cell -> active slot map (int32; the analog of BeginCell)
    cell_slot = jnp.full((ncells + 1,), A, jnp.int32)
    cell_slot = cell_slot.at[jnp.where(run_ok, scid, ncells)].set(
        jnp.where(run_ok, runid, A).astype(jnp.int32), mode="drop")
    cell_slot = cell_slot.at[ncells].set(A)

    # neighbour active slots per active cell
    acx = active_cell % ncx
    acy = (active_cell // ncx) % ncy
    acz = active_cell // (ncx * ncy)
    cols = []
    for (dx, dy, dz) in dom.neigh_offsets():
        nx, ny, nz = acx + dx, acy + dy, acz + dz
        ok = ((nx >= 0) & (nx < ncx) & (ny >= 0) & (ny < ncy)
              & (nz >= 0) & (nz < ncz) & (active_cell < ncells))
        ncell = jnp.where(ok, (nz * ncy + ny) * ncx + nx, ncells)
        cols.append(cell_slot[ncell])
    neigh_slot = jnp.stack(cols, axis=1)

    return DivData(bucket_idx=bucket_idx, neigh_slot=neigh_slot,
                   cell_slot=cell_slot, nactive=nactive, overflow=overflow,
                   ncap=n), new_code


def point_candidates(dom: Domain, div: DivData, points, origin=None):
    """Candidate particle indices around arbitrary query points (m,3):
    returns (m, NN*K) canonical indices (n = empty).  Used by mDBC ghost
    nodes, gauges, and inout extrapolation — the analog of running
    `nsearch::Init` at a free position (JSphCpu.cpp:1045).  ``origin``:
    traced grid anchor override (sharded slab grids)."""
    ncx, ncy, ncz = dom.nc
    ncells = dom.ncells
    A, K = div.bucket_idx.shape[0] - 1, div.bucket_idx.shape[1]
    cxyz = cell_coords(dom, points, origin)
    inside = jnp.all((cxyz >= 0) & (cxyz < jnp.array(dom.nc, jnp.int32)), axis=1)
    cols = []
    for (dx, dy, dz) in dom.neigh_offsets():
        nx = cxyz[:, 0] + dx
        ny = cxyz[:, 1] + dy
        nz = cxyz[:, 2] + dz
        ok = (inside & (nx >= 0) & (nx < ncx) & (ny >= 0) & (ny < ncy)
              & (nz >= 0) & (nz < ncz))
        ncell = jnp.where(ok, (nz * ncy + ny) * ncx + nx, ncells)
        cols.append(div.cell_slot[ncell])
    slots = jnp.stack(cols, axis=1)                  # (m, NN)
    cand = div.bucket_idx[slots]                     # (m, NN, K)
    return cand.reshape(points.shape[0], -1)


@jax.tree_util.register_dataclass
@dataclass
class SortDiv:
    """Sorted-order cell division for the Pallas cell-tile force kernel.

    Particles are viewed through the sort permutation (the reference's
    physically reordered arrays, `JSphCpuSingle.cpp:450-467`); every active
    cell knows its sorted target range and the 9 contiguous (y,z)-row
    candidate windows (`JCellSearch_inline.h:33-92` made static-shape)."""
    order: jax.Array       # (n,) canonical index of each sorted row
    srow: jax.Array        # (n,) runid*tile_t + rank of each sorted row (or sentinel)
    tstart: jax.Array      # (A,) first sorted index of the cell
    tcount: jax.Array      # (A,) particles in the cell (0 => inactive slot)
    wstart: jax.Array      # (A, R) window start, aligned down to 128 lanes
    woff: jax.Array        # (A, R) first valid lane within the window
    wcount: jax.Array      # (A, R) number of valid lanes from woff
    nactive: jax.Array     # () i32
    overflow: jax.Array    # () i32 — tcount beyond tile / wcount beyond window
    ncap: int = field(metadata=dict(static=True), default=0)


def divide_sorted(dom: Domain, pos, code, tile_t: int, tile_w: int,
                  origin=None, group_sx: int = 1, maxgroups: int = 0):
    """Sorted divide producing the target-block/row-window structure for the
    Pallas kernel.

    Targets are grouped into DENSE blocks: runs of sorted particles within one
    (y,z) row and one x-tile of ``group_sx`` cells, chopped at ``tile_t``
    particles.  With group_sx=1 this degenerates to one block per cell; larger
    tiles pack several cells' particles into one (mostly full) target tile,
    which is what keeps the kernel's sublane occupancy high.  Each block's
    candidate windows span its x-tile +-1 cell over the 9 (3 in 2D) neighbour
    rows — a superset of every member's 27-cell neighbourhood; the kernel's
    rr2 cutoff discards the extras.
    """
    n = pos.shape[0]
    ncells = dom.ncells
    ncx, ncy, ncz = dom.nc
    SX = group_sx
    nxt = -(-ncx // SX)                 # x-tiles per row
    A = maxgroups or dom.maxcells or min(ncells, n)

    cxyz = cell_coords(dom, pos, origin)
    inside = jnp.all((cxyz >= 0) & (cxyz < jnp.array(dom.nc, jnp.int32)), axis=1)
    active = td.is_active(code)
    newly_out = active & ~inside
    new_code = jnp.where(newly_out, td.code_set_special(code, td.SPECIAL_OUT_POS),
                         code)
    live = active & inside

    cellid = (cxyz[:, 2] * ncy + cxyz[:, 1]) * ncx + cxyz[:, 0]
    cellid = jnp.where(live, cellid, ncells)
    # one sort yields both the sorted keys and the permutation — argsort +
    # a separate 267k gather costs ~2x (gathers are the slow path on TPU)
    scid, order = jax.lax.sort_key_val(
        cellid, jnp.arange(n, dtype=jnp.int32), is_stable=True)
    svalid = scid < ncells

    # cellstart[c] = first sorted row with scid >= c.  searchsorted costs
    # ~12 ms at 250k on v5e (ncells binary searches = random gathers);
    # scatter-min + reverse cummin builds the same table in ~5 ms.
    iar = jnp.arange(n, dtype=jnp.int32)
    cellstart = jnp.full((ncells + 1,), n, jnp.int32).at[
        jnp.minimum(scid, ncells)].min(iar, mode="drop")
    cellstart = jax.lax.associative_scan(jnp.minimum, cellstart,
                                         reverse=True)

    # group key: (row, x-tile); dead particles get a sentinel key
    srow_cells = scid // ncx            # (z*ncy+y) row index
    sxtile = (scid % ncx) // SX
    gkey = jnp.where(svalid, srow_cells * nxt + sxtile, ncells)

    iarange = jnp.arange(n, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, gkey.dtype), gkey[:-1]])
    newkey = gkey != prev
    keystart = jax.lax.cummax(jnp.where(newkey, iarange, 0))
    rank_in_key = iarange - keystart
    newblock = newkey | (rank_in_key % tile_t == 0)
    blockid = jnp.cumsum(newblock.astype(jnp.int32)) - 1
    blockstart = jax.lax.cummax(jnp.where(newblock, iarange, 0))
    rank = iarange - blockstart
    nactive = jnp.sum((newblock & svalid).astype(jnp.int32))

    srow_ok = svalid & (blockid < A)
    srow = jnp.where(srow_ok, blockid * tile_t + rank, A * tile_t)

    # per-block tables (scatter block starts)
    blk_ok = newblock & svalid & (blockid < A)
    slot = jnp.where(blk_ok, blockid, A)
    tstart = jnp.full((A,), n, jnp.int32).at[slot].set(
        jnp.where(blk_ok, iarange, n), mode="drop")
    blk_row = jnp.full((A,), -1, jnp.int32).at[slot].set(
        jnp.where(blk_ok, srow_cells, -1).astype(jnp.int32), mode="drop")
    blk_xt = jnp.zeros((A,), jnp.int32).at[slot].set(
        jnp.where(blk_ok, sxtile, 0).astype(jnp.int32), mode="drop")
    # actual x-cell span of each block (windows adapt to content; the x-tile
    # only caps the worst case)
    scx = scid % ncx
    pslot = jnp.where(svalid & (blockid < A), blockid, A)
    blk_cxmin = jnp.full((A,), 2 ** 30, jnp.int32).at[pslot].min(
        jnp.where(svalid, scx, 2 ** 30).astype(jnp.int32), mode="drop")
    blk_cxmax = jnp.full((A,), -1, jnp.int32).at[pslot].max(
        jnp.where(svalid, scx, -1).astype(jnp.int32), mode="drop")
    # block length: next block's start (or end of live region) - start
    nlive = cellstart[ncells]
    bstarts_sorted = tstart  # ascending by construction (blockid order)
    bnext = jnp.concatenate([bstarts_sorted[1:], jnp.full((1,), 0, jnp.int32)])
    is_blk = blk_row >= 0
    bnext = jnp.where(bnext <= tstart, nlive, jnp.minimum(bnext, nlive))
    tcount = jnp.where(is_blk, jnp.minimum(bnext - tstart, tile_t), 0)
    overflow = jnp.sum((newblock & svalid & (blockid >= A)).astype(jnp.int32))

    # candidate windows: x-tile cells +-1, over the neighbour rows
    bry = blk_row % ncy
    brz = blk_row // ncy
    xlo = jnp.maximum(blk_cxmin - 1, 0)
    xhi = jnp.minimum(blk_cxmax + 1, ncx - 1)
    dys = (0,) if dom.simulate2d else (-1, 0, 1)
    ws_l, wc_l = [], []
    for dz in (-1, 0, 1):
        for dy in dys:
            ny, nz = bry + dy, brz + dz
            ok = is_blk & (ny >= 0) & (ny < ncy) & (nz >= 0) & (nz < ncz)
            row = (nz * ncy + ny) * ncx
            s = cellstart[jnp.clip(row + xlo, 0, ncells)]
            e = cellstart[jnp.clip(row + xhi + 1, 0, ncells)]
            ws_l.append(jnp.where(ok, s, 0))
            wc_l.append(jnp.where(ok, e - s, 0))
    wstart = jnp.stack(ws_l, axis=1)
    wcount = jnp.stack(wc_l, axis=1)
    # Mosaic dynamic-slice DMAs need 128-lane-aligned starts; keep the true
    # start as an in-window offset instead
    wstart_al = (wstart // 128) * 128
    woff = wstart - wstart_al

    overflow = overflow + jnp.sum(jnp.maximum(woff + wcount - tile_w, 0))

    return SortDiv(order=order, srow=srow, tstart=jnp.where(is_blk, tstart, 0),
                   tcount=tcount, wstart=wstart_al, woff=woff, wcount=wcount,
                   nactive=nactive, overflow=overflow, ncap=n), new_code


@jax.tree_util.register_dataclass
@dataclass
class RowDiv:
    """Row-padded sorted divide for the Pallas cell-tile kernel.

    Particles are sorted by cell and laid out so every (y,z) cell-row starts
    at a multiple of the target-tile size T.  Blocks are then the FIXED tiles
    [b*T, (b+1)*T) of the padded layout: block starts are implicit, so the
    kernel's target reads and force writes become plain blocked reshapes —
    the per-interaction target gather and output scatter of the group-run
    layout (SortDiv) disappear entirely.  Pad slots carry poisoned positions
    (outside any kernel support) and contribute exactly nothing.

    The layout stays valid while no particle has moved more than half the
    cell skin (Domain.scell - kernelsize) since the rebuild — the classic
    Verlet-list contract applied at the window level, which amortizes the
    whole divide over ~10-30 steps (reference rebuilds every step,
    `JSphGpuSingle::RunCellDivide`; we trade a slightly larger cell for
    rebuild-free steps)."""
    perm: jax.Array        # (NP,) canonical index of each padded slot, or NP
    tcount: jax.Array      # (A,) live+dead real rows of block b (pads beyond)
    wstart: jax.Array      # (A, R) window start in padded coords
    wcount: jax.Array      # (A, R) window length
    nactive: jax.Array     # () i32 — blocks with tcount>0
    overflow: jax.Array    # () i32 — window content beyond tile_w
    used: jax.Array        # () i32 — padded slots in use
    ncap: int = field(metadata=dict(static=True), default=0)   # NP
    # --- v3 trimmed-window kernel tables (None on the v1/merged layout) ---
    # groups = K consecutive blocks; per group the UNION of its blocks' R
    # per-row windows is DMA'd once, each block's pair math runs only on its
    # own trimmed [soff, soff+wcount) segment of that union (see
    # pallas.cellforce interaction_forces_rows_v3)
    gws: jax.Array = None      # (G, R) union window start (padded coords)
    gwc: jax.Array = None      # (G, R) union window content length
    gwide: jax.Array = None    # (G,) i32 1 = union exceeds the narrow W bound
    soff: jax.Array = None     # (G, K*R) block window start local to the
    #                            128-floored union start, group-slot order
    swc: jax.Array = None      # (G, K*R) block window length, group-slot order
    gblk: jax.Array = None     # (G, K) block id of each group slot (or A)
    ngrp: jax.Array = None     # () i32 groups in use (prefix of the tables)
    inv: jax.Array = None      # (A,) output-block index of each block in
    #                            [narrow (G*K) | wide (CAPW*K) | 1 zero]
    widelist: jax.Array = None  # (CAPW,) wide group ids (sentinel G)
    nwide: jax.Array = None     # () i32 wide groups found
    # flattened chunk-descriptor list (narrow kernel's branch-free segment
    # loop): one packed i32 per 128-lane chunk —
    #   bits 0-6 base//128 (128-aligned lane start in the plane buffer),
    #   bits 7-13 valid-lane count - 1, bits 14-20 segment start offset
    #   within the aligned slab, bits 21-24 DMA plane index
    desc: jax.Array = None     # (G, K*MC) packed chunk descriptors
    chn: jax.Array = None      # (G, K) chunks per block (<= MC)


ROWDIV_SX = 128     # x-tile chop: bounds any block's x-span to <= ROWDIV_SX
                    # cells, which makes (ROWDIV_SX+2)*cellcap a TRUE bound on
                    # window content (sparse rows otherwise let one block span
                    # the whole row and overflow the static window)


def finex() -> int:
    """Sub-cells per cell along x for the window-start table (DSPH_FINEX,
    default 4; 1 disables).  The sort key gains log2(NSUB) low bits of
    sub-cell x, so candidate windows can start/end at sub-cell granularity:
    a window must reach exactly KernelSize+skin = one scell beyond the
    block's particle x-extent, and cell-granularity rounding wastes a mean
    (NSUB-1)/(2*NSUB) cell of dead candidate lanes per side."""
    import os
    # default 8 measured best on the 267k bench (abkern r5: FINEX=4
    # 16.9 ms/interaction, FINEX=8 16.3)
    v = int(os.environ.get("DSPH_FINEX", "8"))
    assert v in (1, 2, 4, 8), "DSPH_FINEX must be 1, 2, 4 or 8"
    return v


def rowdiv_merged(dom: Domain) -> bool:
    """True when the padded layout supports MERGED neighbour windows: with a
    single x-tile per row (ncx <= ROWDIV_SX) consecutive (y,z) cell-rows are
    adjacent in padded coordinates, so the 3 dy-rows of one dz plane (2D: the
    3 dz-rows outright) form ONE contiguous window.  R drops 9 -> 3 (2D:
    3 -> 1), which cuts the kernel's dominant per-row DMA issue/wait cost 3x;
    the gap content between the per-row windows is row padding + off-window
    cells, all position-poisoned, so extra lanes self-mask in the pair ALU.

    ``DSPH_ROWDIV_MERGED=0`` forces the per-row path (bench A/B knob)."""
    import os
    if os.environ.get("DSPH_ROWDIV_MERGED", "1") == "0":
        return False
    return dom.nc[0] <= ROWDIV_SX


def rowdiv_capacity(dom: Domain, n: int, tile_t: int, group: int = 1) -> int:
    """Static padded capacity: every occupied (y,z,x-tile) group pads to a
    multiple of tile_t; occupied groups <= min(#groups, n).  ``group`` rounds
    the block count up to a multiple of the kernel's K-block group size."""
    nxt = -(-dom.nc[0] // ROWDIV_SX)
    ngroups = dom.nc[1] * dom.nc[2] * nxt
    npad = n + (tile_t - 1) * min(ngroups, n) + tile_t
    m = tile_t * group
    return -(-npad // m) * m


def v3_planes(dom: Domain, n: int = 0) -> int:
    """DMA planes per v3 kernel group: dz-plane-merged (3, or 1 in 2D) when
    every row fits one x-tile AND the merged spans stay NARROW-bound sized —
    a merged plane union spans from the dy=-1 row's window START to the
    dy=+1 row's window END, i.e. up to 3 whole padded rows.  Two gates:

    * worst case (3 * ncx * cellcap) must fit the descriptor base field
      (16384 lanes, ``DSPH_MERGEBOUND``);
    * with ``n`` given, the TYPICAL 3-row span (2x the mean occupied-row
      length, padded) must fit the narrow union bound the kernel will use
      (min(worst, 3072) — see cellforce.v3_params).  Without this gate,
      domains whose typical plane unions land between 3072 and 16384 get
      merging enabled but mass-route groups to the wide fallback — the
      round-4 perf collapse + fatal CAPW overflow pathology.

    Else one DMA per neighbour (y,z) cell-row.  Pass the same ``n`` the
    kernel's v3_params saw (or use the dict's precomputed ``PD``) so the
    divide and the kernel always agree."""
    import os
    R = 3 if dom.simulate2d else 9
    if -(-dom.nc[0] // ROWDIV_SX) != 1:
        return R
    bound = int(os.environ.get("DSPH_MERGEBOUND", "16384"))
    if 3 * dom.nc[0] * dom.cellcap + 256 > bound:
        return R
    if n:
        nrows = max(1, dom.nc[2] * (1 if dom.simulate2d else dom.nc[1]))
        wu_cap = int(os.environ.get("DSPH_WU",
                                    min(3 * dom.nc[0] * dom.cellcap + 256,
                                        3072)))
        est = 3 * (2 * n // nrows + 32) + 256
        if est > wu_cap:
            return R
    return 1 if dom.simulate2d else 3


def v3_gcap(dom: Domain, A: int, K: int) -> int:
    """Static group-table capacity for the v3 kernel: groups never cross a
    padded (row, x-tile) boundary, so at most one partial group per row is
    added to the dense A/K count."""
    nxt = -(-dom.nc[0] // ROWDIV_SX)
    return A // K + dom.nc[1] * dom.nc[2] * nxt + 1


def divide_rows(dom: Domain, pos, code, tile_t: int, tile_w: int,
                origin=None, v3: dict = None):
    """Row-padded sorted divide (see RowDiv).  ``pos``/``code`` must already
    be capacity ``NP = rowdiv_capacity(...)`` (dead slots: inactive code).

    Replaces the per-step group-run divide for the amortized-rebuild path;
    all tables are built with sorts, scans and small-table gathers — the
    only O(ncells) scatter is the cellstart table (amortized ~10-30x by the
    skin contract)."""
    NP = pos.shape[0]
    T = tile_t
    assert NP % T == 0, "state capacity must be a tile_t multiple"
    A = NP // T
    ncells = dom.ncells
    ncx, ncy, ncz = dom.nc
    nrows = ncy * ncz

    cxyz = cell_coords(dom, pos, origin)
    inside = jnp.all((cxyz >= 0) & (cxyz < jnp.array(dom.nc, jnp.int32)),
                     axis=1)
    active = td.is_active(code)
    newly_out = active & ~inside
    new_code = jnp.where(newly_out,
                         td.code_set_special(code, td.SPECIAL_OUT_POS), code)
    live = active & inside

    # sort key = cellid * NSUB + sub-cell x (finex): window starts/ends can
    # then be looked up at sub-cell granularity
    NSUB = finex()
    ncellsF = ncells * NSUB
    cellid = (cxyz[:, 2] * ncy + cxyz[:, 1]) * ncx + cxyz[:, 0]
    if NSUB > 1:
        ox = (jnp.asarray(dom.posmin, pos.dtype)[0] if origin is None
              else jnp.asarray(origin, pos.dtype)[0])
        frx = (pos[:, 0] - ox) * (1.0 / dom.scell) - cxyz[:, 0]
        subx = jnp.clip((frx * NSUB).astype(jnp.int32), 0, NSUB - 1)
        skey = cellid * NSUB + subx
    else:
        skey = cellid
    skey = jnp.where(live, skey, ncellsF)
    sskey, order = jax.lax.sort_key_val(
        skey, jnp.arange(NP, dtype=jnp.int32), is_stable=True)
    scid = sskey // NSUB

    # cellstartF[c] = first sorted row with sskey >= c (scatter-min + reverse
    # cummin, the one O(ncells*NSUB) pass); cell granularity = every NSUB-th
    iar = jnp.arange(NP, dtype=jnp.int32)
    cellstartF = jnp.full((ncellsF + 1,), NP, jnp.int32).at[
        jnp.minimum(sskey, ncellsF)].min(iar, mode="drop")
    cellstartF = jax.lax.associative_scan(jnp.minimum, cellstartF,
                                          reverse=True)
    cellstart = cellstartF[::NSUB]

    # per-group tables: group = (y,z cell-row, ROWDIV_SX x-tile) — the x-tile
    # chop bounds any block's x-span so the static window W is a true bound
    SX = ROWDIV_SX
    nxt = -(-ncx // SX)
    ngroups = nrows * nxt
    gidx = jnp.arange(ngroups + 1, dtype=jnp.int32)
    gcell = jnp.minimum((gidx // nxt) * ncx + (gidx % nxt) * SX, ncells)
    groupstart_u = cellstart[gcell]
    groupsize = groupstart_u[1:] - groupstart_u[:-1]
    grouppad = -(-groupsize // T) * T
    padoff = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(grouppad).astype(jnp.int32)])
    used = padoff[ngroups]

    # slot -> group table: scatter each occupied group id at its padded
    # start, then forward-fill (scatter is ngroups-sized — cheap)
    mark_at = jnp.where(grouppad > 0, padoff[:-1], NP)
    gid_of_slot = jnp.zeros((NP,), jnp.int32).at[mark_at].max(
        gidx[:-1], mode="drop")
    gid_of_slot = jax.lax.cummax(gid_of_slot)

    slots = jnp.arange(NP, dtype=jnp.int32)
    rk = slots - padoff[gid_of_slot]              # rank within padded group
    src = groupstart_u[gid_of_slot] + rk          # sorted index
    valid = (rk < groupsize[gid_of_slot]) & (slots < used)
    perm = jnp.where(valid, jnp.take(order, jnp.minimum(src, NP - 1)), NP)
    skey_of_slot = jnp.where(valid,
                             jnp.take(sskey, jnp.minimum(src, NP - 1)),
                             ncellsF)
    scell_of_slot = skey_of_slot // NSUB

    # sub-cell start table in padded coordinates
    arrF = jnp.arange(ncellsF + 1, dtype=jnp.int32)
    cidxF = arrF // NSUB
    cellF_g = jnp.minimum((cidxF // ncx) * nxt + (cidxF % ncx) // SX,
                          ngroups - 1)
    cellstartFP = cellstartF - groupstart_u[cellF_g] + padoff[cellF_g]
    cellstartFP = cellstartFP.at[ncellsF].set(used)

    # block tables: block b = slots [b*T, (b+1)*T)
    blk_gid = gid_of_slot.reshape(A, T)[:, 0]
    blk_row = blk_gid // nxt
    gend = padoff[blk_gid] + groupsize[blk_gid]
    bstart = jnp.arange(A, dtype=jnp.int32) * T
    tcount = jnp.clip(gend - bstart, 0, T)
    nactive = jnp.sum((tcount > 0).astype(jnp.int32))

    # block x-extent in sub-cell units; the window must reach exactly one
    # scell (= KernelSize + skin) beyond it on each side
    ncxF = ncx * NSUB
    sxf = jnp.where(valid, skey_of_slot % ncxF, 0)
    cxm = jnp.where(valid, sxf, 2 ** 30).reshape(A, T)
    cxM = jnp.where(valid, sxf, -1).reshape(A, T)
    blk_sxmin = jnp.min(cxm, axis=1)
    blk_sxmax = jnp.max(cxM, axis=1)

    is_blk = tcount > 0
    # [xlo, xhi) window bounds in sub-cell units
    xlo = jnp.maximum(jnp.where(is_blk, blk_sxmin, 0) - NSUB, 0)
    xhi = jnp.minimum(jnp.where(is_blk, blk_sxmax, 0) + 1 + NSUB, ncxF)
    bry = blk_row % ncy
    brz = blk_row // ncy
    ws_l, wc_l = [], []
    if v3 is not None:
        # v3 trimmed layout: per-block window per neighbour (y,z) row (the
        # merged whole-row windows cost ~12x the pair math at wide domains —
        # measured 3% live-lane fraction on the 267k dam break)
        dys = (0,) if dom.simulate2d else (-1, 0, 1)
        for dz in (-1, 0, 1):
            for dy in dys:
                ny, nz = bry + dy, brz + dz
                ok = is_blk & (ny >= 0) & (ny < ncy) & (nz >= 0) & (nz < ncz)
                row = (nz * ncy + ny) * ncxF
                s = cellstartFP[jnp.clip(row + xlo, 0, ncellsF)]
                e = cellstartFP[jnp.clip(row + xhi, 0, ncellsF)]
                ws_l.append(jnp.where(ok, s, 0))
                wc_l.append(jnp.where(ok, e - s, 0))
        wstart = jnp.stack(ws_l, axis=1)
        wcount = jnp.stack(wc_l, axis=1)
        K, WU, WW, CAPW = v3["K"], v3["WU"], v3["WW"], v3["CAPW"]
        R = wstart.shape[1]
        # DMA planes: with one x-tile per row (nxt == 1) the dy-adjacent
        # (3D) / dz-adjacent (2D) cell-rows are CONSECUTIVE padded rows, so
        # each dz plane's 3 row windows merge into ONE contiguous DMA —
        # 9 -> 3 (2D: 3 -> 1) window DMAs per group; segments stay per-row
        # trimmed, with offsets local to their plane's floored start.
        # Merging is gated on the 3-row span bound (see v3_planes); prefer
        # the kernel's precomputed decision (v3_params "PD") so divide and
        # kernel can never disagree on the plane layout.
        PD = v3.get("PD") or v3_planes(dom)
        RP = R // PD                                 # rows per DMA plane
        GCAP = v3_gcap(dom, A, K)
        # ---- group table: K blocks per group, never crossing a padded
        # (row, x-tile) group boundary, so each union window stays a tight
        # same-row slot range.  gblk[g, k] = block id or A (sentinel).
        nblocks_g = grouppad // T                    # (ngroups,) blocks/group
        kgroups_g = -(-nblocks_g // K)               # pallas groups/group
        kgoff = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(kgroups_g).astype(jnp.int32)])
        bids = jnp.arange(A, dtype=jnp.int32)
        rank = bids - padoff[blk_gid] // T           # rank within its row
        in_use = bids < used // T
        kgrp = kgoff[blk_gid] + rank // K
        kslot = rank % K
        flat = jnp.where(in_use, kgrp * K + kslot, GCAP * K)
        gblk = jnp.full((GCAP * K + 1,), A, jnp.int32).at[flat].set(
            bids, mode="drop")[:GCAP * K].reshape(GCAP, K)
        ngrp = kgoff[ngroups]
        # ---- per-group tables in group-slot order (sentinel -> 0 rows)
        wsp = jnp.concatenate([wstart, jnp.zeros((1, R), jnp.int32)])
        wcp = jnp.concatenate([wcount, jnp.zeros((1, R), jnp.int32)])
        wsg = wsp[gblk.reshape(-1)].reshape(GCAP, K, R)
        wcg = wcp[gblk.reshape(-1)].reshape(GCAP, K, R)
        # union windows over blocks AND the plane's rows (min start /
        # max end over entries with content)
        BIG = jnp.int32(2 ** 30)
        has = wcg > 0
        hasp = has.reshape(GCAP, K, PD, RP)
        wsgp = wsg.reshape(GCAP, K, PD, RP)
        wcgp = wcg.reshape(GCAP, K, PD, RP)
        gws = jnp.min(jnp.where(hasp, wsgp, BIG), axis=(1, 3))
        gwe = jnp.max(jnp.where(hasp, wsgp + wcgp, -1), axis=(1, 3))
        any_has = jnp.any(hasp, axis=(1, 3))
        gws = jnp.where(any_has, gws, 0)             # (GCAP, PD)
        gwc = jnp.where(any_has, gwe - gws, 0)
        # narrow iff every plane union fits the W bound from its 128-floored
        # DMA start; wide groups run the fallback call with the WW bound
        gfloor = (gws // 128) * 128
        gwide = jnp.any(gws - gfloor + gwc > WU, axis=1).astype(jnp.int32)
        # block segment starts local to their PLANE's floored DMA start
        pfloor = jnp.repeat(gfloor, RP, axis=1)      # (GCAP, R)
        soff = jnp.where(has, wsg - pfloor[:, None, :], 0)
        # ---- flattened chunk-descriptor table (the narrow kernel's
        # branch-free segment loop, pallas.cellforce._kernel_v3 flat path):
        # one packed i32 per 128-lane roll-aligned chunk, compacted per
        # block in row order.  Groups whose blocks exceed the static caps
        # (MC chunks/block, CR chunks/row) are ROUTED TO THE WIDE FALLBACK
        # (legacy per-segment loop, no descriptor limit) instead of dropping
        # chunks — overflow stays structurally impossible for narrow groups.
        # descriptor layout (25 bits): p(4) | off0(7) | vcm1(7) | base/128(7)
        # — base is always 128-aligned so only base//128 is stored, which
        # frees enough bits for per-row plane indices (PD up to 16)
        CWC = 128                                    # = cellforce.CW
        MC = v3.get("MC", 3 * R)
        CR = 6                                       # static chunks/row cap
        v_ = jnp.arange(CR, dtype=jnp.int32)
        base0 = (soff // CWC) * CWC                  # (GCAP, K, R)
        off0 = soff - base0                          # [0, 128)
        cvalid = (v_ * CWC)[None, None, None, :] < wcg[..., None]
        cb7 = base0[..., None] // CWC + v_           # (GCAP, K, R, CR)
        vcm1 = jnp.clip(wcg[..., None] - v_ * CWC, 1, CWC) - 1
        p_r = jnp.arange(R, dtype=jnp.int32) // RP   # (R,) DMA plane of row
        dsc = (((p_r[None, None, :, None] * 128 + off0[..., None]) * 128
                + vcm1) * 128 + cb7)
        # invalid chunks read plane 0 base 0 fully masked: the kernel's
        # unrolled loop touches one descriptor past chn, which must stay an
        # in-bounds slab address
        dsc = jnp.where(cvalid, dsc, 0)
        RC = R * CR
        cvf = cvalid.reshape(GCAP, K, RC)
        idx = jnp.arange(RC, dtype=jnp.int32)
        order = jnp.argsort(jnp.where(cvf, idx, RC + idx), axis=-1)[..., :MC]
        desc = jnp.take_along_axis(dsc.reshape(GCAP, K, RC), order, axis=-1)
        nch_t = jnp.sum(cvf, axis=-1)                # (GCAP, K)
        chn = jnp.minimum(nch_t, MC).astype(jnp.int32)
        overcap = (nch_t > MC) | jnp.any(-(-wcg // CWC) > CR, axis=2)
        gwide = jnp.maximum(gwide,
                            jnp.any(overcap, axis=1).astype(jnp.int32))
        # wide-group compaction: ids of wide groups first, sentinel GCAP
        widx = jnp.where(gwide > 0, jnp.arange(GCAP, dtype=jnp.int32), GCAP)
        widx = jnp.sort(widx)
        nwide = jnp.sum(gwide)
        widelist = widx[:CAPW] if CAPW <= GCAP else jnp.pad(
            widx, (0, CAPW - GCAP), constant_values=GCAP)
        overflow = jnp.maximum(nwide - CAPW, 0)
        # wide windows must fit the WW bound (cellcap breach otherwise)
        overflow = overflow + jnp.sum(jnp.maximum(
            jnp.where(gwide[:, None, None] > 0, soff + wcg, 0) - WW, 0))
        # inverse map: block b -> its output block in the concatenated
        # [narrow (GCAP*K) | wide (CAPW*K) | zero sentinel] kernel output
        wslot = jnp.cumsum(gwide) - 1                # rank among wide groups
        wbase = GCAP * K + jnp.minimum(wslot, CAPW - 1) * K
        obase = jnp.where(gwide > 0, wbase,
                          jnp.arange(GCAP, dtype=jnp.int32) * K)
        inv = jnp.where(in_use, obase[jnp.minimum(kgrp, GCAP - 1)] + kslot,
                        GCAP * K + CAPW * K)
        return RowDiv(perm=perm, tcount=tcount, wstart=wstart, wcount=wcount,
                      nactive=nactive, overflow=overflow, used=used, ncap=NP,
                      gws=gws, gwc=gwc, gwide=gwide,
                      soff=soff.reshape(GCAP, K * R),
                      swc=wcg.reshape(GCAP, K * R), gblk=gblk, ngrp=ngrp,
                      inv=inv, widelist=widelist, nwide=nwide,
                      desc=desc.reshape(GCAP, K * MC), chn=chn), new_code
    if rowdiv_merged(dom) and dom.simulate2d:
        # one window: rows are z (ncy==1) and z-adjacent rows are adjacent in
        # padded coords, so [z-1 @ xlo, z+1 @ xhi] is one contiguous range
        z_lo = jnp.maximum(brz - 1, 0)
        z_hi = jnp.minimum(brz + 1, ncz - 1)
        s = cellstartFP[jnp.clip(z_lo * ncxF + xlo, 0, ncellsF)]
        e = cellstartFP[jnp.clip(z_hi * ncxF + xhi, 0, ncellsF)]
        ws_l.append(jnp.where(is_blk, s, 0))
        wc_l.append(jnp.where(is_blk, e - s, 0))
    elif rowdiv_merged(dom):
        # one window per dz plane covering the 3 dy rows (see rowdiv_merged)
        y_lo = jnp.maximum(bry - 1, 0)
        y_hi = jnp.minimum(bry + 1, ncy - 1)
        for dz in (-1, 0, 1):
            nz = brz + dz
            ok = is_blk & (nz >= 0) & (nz < ncz)
            s = cellstartFP[jnp.clip((nz * ncy + y_lo) * ncxF + xlo,
                                     0, ncellsF)]
            e = cellstartFP[jnp.clip((nz * ncy + y_hi) * ncxF + xhi,
                                     0, ncellsF)]
            ws_l.append(jnp.where(ok, s, 0))
            wc_l.append(jnp.where(ok, e - s, 0))
    else:
        dys = (0,) if dom.simulate2d else (-1, 0, 1)
        for dz in (-1, 0, 1):
            for dy in dys:
                ny, nz = bry + dy, brz + dz
                ok = is_blk & (ny >= 0) & (ny < ncy) & (nz >= 0) & (nz < ncz)
                row = (nz * ncy + ny) * ncxF
                s = cellstartFP[jnp.clip(row + xlo, 0, ncellsF)]
                e = cellstartFP[jnp.clip(row + xhi, 0, ncellsF)]
                ws_l.append(jnp.where(ok, s, 0))
                wc_l.append(jnp.where(ok, e - s, 0))
    wstart = jnp.stack(ws_l, axis=1)
    wcount = jnp.stack(wc_l, axis=1)
    # the kernel's shifted copies leave < GSHIFT dead leading lanes
    overflow = jnp.sum(jnp.maximum(wcount + 16 - tile_w, 0))

    return RowDiv(perm=perm, tcount=tcount, wstart=wstart, wcount=wcount,
                  nactive=nactive, overflow=overflow, used=used, ncap=NP), \
        new_code


def gather(field_arr, idx, fill=0.0):
    """Gather canonical particle data by bucket indices; sentinel index == n
    yields ``fill``.  Works for (n,) and (n, d) fields."""
    import numpy as np
    return jnp.take(field_arr, idx, axis=0, mode="fill",
                    fill_value=np.dtype(field_arr.dtype).type(fill))


def scatter_add(n, idx, values, width=None):
    """Scatter bucket-layout values back to canonical order.  Each live
    particle occupies exactly one bucket slot, so this is collision-free
    (the gather-only force formulation keeps TPU scatter race-free, like the
    reference's one-thread-per-target pattern, SURVEY §5.2)."""
    shape = (n,) if width is None else (n, width)
    out = jnp.zeros(shape, values.dtype)
    return out.at[idx.reshape(-1)].add(values.reshape((-1,) + values.shape[len(idx.shape):]),
                                       mode="drop")
