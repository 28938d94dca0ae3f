"""Domain decomposition over a TPU mesh: slab sharding + halo exchange.

The reference reserves a multi-device design but never ships one
(`TpMgDivMode` MGDIV_X/Y/Z `DualSphDef.h:494-510`, "belongs to Process-1/+1"
particle codes `DualSphDef.h:175-176`, `WithMpi` permanently false
`JSph.cpp:74`; SURVEY §2.8).  This module supplies the TPU-native version as a
first-class feature:

* the global cell grid is split into **slabs along x** (the MGDIV_X design)
  over a 1-D `jax.sharding.Mesh` axis; every shard owns a fixed-capacity
  particle buffer (the global state is simply sharded on the particle axis);
* each step runs under `shard_map`: **migration** moves particles whose
  x-cell changed owner to the adjacent shard (one `ppermute` per direction —
  CFL guarantees single-slab hops), and **halo exchange** copies edge-column
  particles to the neighbour as transient ghosts before every cell divide
  (ghosts are marked with the periodic special code, so like the reference's
  periodic ghosts they are excluded from AceMax and never integrated);
* the per-step dt is a global `lax.pmin`; diagnostics are `psum`/`pmax` —
  the two first-class communication patterns called out in SURVEY §5.8, both
  riding ICI.

Everything is static-shape: migration and ghost buffers have fixed capacities
with counted (never silent) overflow.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import numpy as np

from .. import typesdef as td
from ..typesdef import CteSph, TpShifting, TpStep, TpVisco
from ..ops import celldiv as cd
from ..ops import eos
from ..ops import forces as F
from ..ops import integrators as I
from ..ops.forces import SolverOpts
from ..models.wcsph import SimState, StepCarry, make_carry

AXIS = "dd"   # mesh axis name for the domain decomposition


@dataclass(frozen=True)
class ShardCfg:
    """Static sharding configuration."""
    ndev: int
    gdom: cd.Domain       # global cell grid (nc[0] divisible by ndev)
    ldom: cd.Domain       # local slab grid: (ncx_loc + 2 halo columns, ncy, ncz)
    n_local: int          # particle-slot capacity per shard
    mig_cap: int          # max migrants per direction per step
    ghost_cap: int        # max ghost particles per direction per divide

    @property
    def ncx_loc(self) -> int:
        return self.gdom.nc[0] // self.ndev

    @property
    def n_ext(self) -> int:
        return self.n_local + 2 * self.ghost_cap


def make_shard_cfg(gdom: cd.Domain, ndev: int, n_local: int,
                   mig_cap: int = 0, ghost_cap: int = 0) -> ShardCfg:
    ncx = gdom.nc[0]
    if ncx % ndev:
        # grow the grid so the x-cells split evenly (cells beyond the fluid
        # stay empty and cost nothing through active-cell compaction)
        ncx = int(math.ceil(ncx / ndev) * ndev)
        gdom = replace(gdom, nc=(ncx, gdom.nc[1], gdom.nc[2]))
    ncx_loc = ncx // ndev
    if not ghost_cap:
        ghost_cap = max(256, n_local // 4)
    if not mig_cap:
        mig_cap = max(256, n_local // 8)
    ldom = cd.Domain(posmin=gdom.posmin, scell=gdom.scell,
                     nc=(ncx_loc + 2, gdom.nc[1], gdom.nc[2]),
                     simulate2d=gdom.simulate2d, cellcap=gdom.cellcap,
                     maxcells=min((ncx_loc + 2) * gdom.nc[1] * gdom.nc[2],
                                  n_local + 2 * ghost_cap))
    return ShardCfg(ndev=ndev, gdom=gdom, ldom=ldom, n_local=n_local,
                    mig_cap=mig_cap, ghost_cap=ghost_cap)


# ---------------------------------------------------------------------------
# packing / ring exchange helpers (inside shard_map)
# ---------------------------------------------------------------------------

def _pack(flags, arrays, cap):
    """Compact flagged rows into a fixed-size buffer.  Returns
    (buffers, valid (cap,), n_packed, overflow)."""
    order = jnp.argsort(~flags, stable=True)     # flagged rows first
    take = order[:cap]
    cnt = jnp.sum(flags.astype(jnp.int32))
    valid = jnp.arange(cap, dtype=jnp.int32) < cnt
    out = [a[take] for a in arrays]
    overflow = jnp.maximum(cnt - cap, 0)
    return out, valid, take, overflow


def _shift(x, direction, ndev):
    """ppermute by +-1 along the mesh axis; devices with no source get zeros."""
    if ndev == 1:
        return jnp.zeros_like(x)
    if direction > 0:
        perm = [(i, i + 1) for i in range(ndev - 1)]
    else:
        perm = [(i, i - 1) for i in range(1, ndev)]
    return jax.lax.ppermute(x, AXIS, perm)


def _send_both(flag_l, flag_r, arrays, cap, ndev):
    """Pack left/right-flagged rows and exchange with both neighbours.
    Returns (recv_l_arrays, recv_l_valid, recv_r_arrays, recv_r_valid,
    sent_take_l, sent_take_r, n_l, n_r, overflow)."""
    buf_l, val_l, take_l, ov_l = _pack(flag_l, arrays, cap)
    buf_r, val_r, take_r, ov_r = _pack(flag_r, arrays, cap)
    # left-going buffers arrive from the right neighbour and vice versa
    recv_from_r = [_shift(a, -1, ndev) for a in buf_l]
    rvalid_from_r = _shift(val_l.astype(jnp.int32), -1, ndev) > 0
    recv_from_l = [_shift(a, +1, ndev) for a in buf_r]
    rvalid_from_l = _shift(val_r.astype(jnp.int32), +1, ndev) > 0
    return (recv_from_l, rvalid_from_l, recv_from_r, rvalid_from_r,
            take_l, take_r, val_l, val_r, ov_l + ov_r)


_DEAD = td.code_make(td.TYPE_FLUID, 0, td.SPECIAL_OUT_IGNORE)


def _state_arrays(st: SimState):
    arrs = [st.pos, st.vel, st.rho, st.code, st.idp]
    names = ["pos", "vel", "rho", "code", "idp"]
    for nm in ("velm1", "rhom1", "spstau"):
        a = getattr(st, nm)
        if a is not None:
            arrs.append(a)
            names.append(nm)
    return names, arrs


def _rebuild_state(st: SimState, names, arrs) -> SimState:
    kw = dict(zip(names, arrs))
    return replace(st, **kw)


# ---------------------------------------------------------------------------
# migration & halo exchange
# ---------------------------------------------------------------------------

def migrate(cfg: ShardCfg, csp: CteSph, st: SimState, my):
    """Move particles whose owner slab changed to the adjacent shard.
    Returns (new_state, overflow_count)."""
    gdom = cfg.gdom
    live = td.is_active(st.code)
    xcell = jnp.floor((st.pos[:, 0] - gdom.posmin[0]) / gdom.scell).astype(jnp.int32)
    out_x = live & ((xcell < 0) | (xcell >= gdom.nc[0]))
    code = jnp.where(out_x, td.code_set_special(st.code, td.SPECIAL_OUT_POS),
                     st.code)
    st = replace(st, code=code)
    live = td.is_active(st.code)
    owner = jnp.clip(xcell // cfg.ncx_loc, 0, cfg.ndev - 1)
    go_l = live & (owner < my)
    go_r = live & (owner > my)

    names, arrs = _state_arrays(st)
    (recv_l, rv_l, recv_r, rv_r, take_l, take_r, val_l, val_r, ov) = \
        _send_both(go_l, go_r, arrs, cfg.mig_cap, cfg.ndev)

    # kill the rows actually sent (their slot frees up)
    code = st.code
    dead_code = jnp.asarray(_DEAD, code.dtype)
    code = code.at[take_l].set(jnp.where(val_l, dead_code, code[take_l]))
    code = code.at[take_r].set(jnp.where(val_r, dead_code, code[take_r]))
    st = replace(st, code=code)

    # merge the (up to 2*mig_cap) received rows into free slots
    recv = [jnp.concatenate([a, b], axis=0) for a, b in zip(recv_l, recv_r)]
    rvalid = jnp.concatenate([rv_l, rv_r], axis=0)
    # received code: trust sender but drop invalid rows
    ci = names.index("code")
    recv[ci] = jnp.where(rvalid, recv[ci], dead_code)

    live_now = td.is_active(st.code)
    free_first = jnp.argsort(live_now, stable=True)      # dead slots first
    nfree = jnp.sum(~live_now)
    # compact received rows: valid first
    rorder = jnp.argsort(~rvalid, stable=True)
    recv = [a[rorder] for a in recv]
    rvalid = rvalid[rorder]
    nrecv = min(2 * cfg.mig_cap, cfg.n_local)
    ov = ov + jnp.sum(rvalid[nrecv:].astype(jnp.int32))
    recv = [a[:nrecv] for a in recv]
    rvalid = rvalid[:nrecv]
    dest = free_first[:nrecv]
    can_write = rvalid & (jnp.arange(nrecv) < nfree)
    ov = ov + jnp.sum((rvalid & ~can_write).astype(jnp.int32))

    merged = []
    for nm, a, r in zip(names, _state_arrays(st)[1], recv):
        cur = a[dest]
        neww = jnp.where(can_write.reshape((-1,) + (1,) * (r.ndim - 1)), r, cur)
        merged.append(a.at[dest].set(neww))
    return _rebuild_state(st, names, merged), ov


def exchange_ghosts(cfg: ShardCfg, st: SimState, my):
    """Copy live particles within one cell of the slab boundary to the
    neighbour shard as transient ghosts.  Returns extended arrays of length
    n_ext = n_local + 2*ghost_cap (ghost rows carry the periodic special
    code) plus an overflow count."""
    gdom = cfg.gdom
    scell = gdom.scell
    lbnd = gdom.posmin[0] + my.astype(jnp.float32) * (cfg.ncx_loc * scell)
    rbnd = lbnd + cfg.ncx_loc * scell
    live = td.is_active(st.code)
    x = st.pos[:, 0]
    near_l = live & (x < lbnd + scell)
    near_r = live & (x >= rbnd - scell)

    names, arrs = _state_arrays(st)
    (recv_l, rv_l, recv_r, rv_r, *_rest, ov) = _send_both(
        near_l, near_r, arrs, cfg.ghost_cap, cfg.ndev)

    ci = names.index("code")
    ghost_dead = jnp.asarray(_DEAD, st.code.dtype)
    for recv, rv in ((recv_l, rv_l), (recv_r, rv_r)):
        gcode = td.code_set_special(recv[ci], td.SPECIAL_PERIODIC)
        recv[ci] = jnp.where(rv, gcode, ghost_dead)

    ext = [jnp.concatenate([a, l, r], axis=0)
           for a, l, r in zip(arrs, recv_l, recv_r)]
    return names, ext, ov


# ---------------------------------------------------------------------------
# sharded step
# ---------------------------------------------------------------------------

def _sharded_interaction(cfg: ShardCfg, csp: CteSph, opts: SolverOpts,
                         st: SimState, my):
    """Ghost exchange + local divide + fused forces; outputs are canonical
    local-slab order (first n_local rows)."""
    names, ext, ghost_ov = exchange_ghosts(cfg, st, my)
    exd = dict(zip(names, ext))
    origin = jnp.stack([
        jnp.asarray(cfg.gdom.posmin[0], jnp.float32)
        + (my.astype(jnp.float32) * cfg.ncx_loc - 1.0) * cfg.gdom.scell,
        jnp.asarray(cfg.gdom.posmin[1], jnp.float32),
        jnp.asarray(cfg.gdom.posmin[2], jnp.float32)])
    use_pallas = False
    if opts.use_pallas:
        from ..ops.pallas import cellforce as CF
        use_pallas = CF.supports(csp, opts)
    if use_pallas:
        # per-shard fused kernel over the local slab's sorted divide — the
        # same single-chip speed-of-light path, fed by the halo-extended
        # arrays (the halo keeps every owned particle's 27-cell support local)
        n_ext = exd["pos"].shape[0]
        T, W = CF.tiles_for(cfg.ldom)
        sd, ext_code = cd.divide_sorted(
            cfg.ldom, exd["pos"], exd["code"], tile_t=T, tile_w=W,
            origin=origin, group_sx=CF.GROUP_SX,
            maxgroups=CF.maxgroups_for(cfg.ldom, n_ext))
        fr = CF.interaction_forces_pallas(
            csp, opts, cfg.ldom, sd, exd["pos"], exd["vel"], exd["rho"],
            ext_code, interpret=jax.default_backend() == "cpu")
        div_overflow = sd.overflow
    else:
        div, ext_code = cd.divide(cfg.ldom, exd["pos"], exd["code"],
                                  origin=origin)
        press = eos.press_from_rho(csp, exd["rho"])
        fr = F.interaction_forces(csp, opts, div, exd["pos"], exd["vel"],
                                  exd["rho"], press, ext_code,
                                  spstau=exd.get("spstau"))
        div_overflow = div.overflow
    nl = cfg.n_local
    # propagate out-of-local-grid marking back to owned rows
    st = replace(st, code=ext_code[:nl])
    fr_local = F.Forces(
        ace=fr.ace[:nl], ar=fr.ar[:nl], viscdtmax=fr.viscdtmax,
        shiftposfs=None if fr.shiftposfs is None else fr.shiftposfs[:nl],
        shift_blocked=None if fr.shift_blocked is None else fr.shift_blocked[:nl],
        spsgradvel=None if fr.spsgradvel is None else fr.spsgradvel[:nl])
    return st, fr_local, div_overflow + ghost_ov


def make_sharded_step(cfg: ShardCfg, csp: CteSph, opts: SolverOpts):
    """Per-shard step body (call inside shard_map).  Symplectic only for now;
    Verlet mirrors the single-chip driver."""

    def reduce_max(x):
        return jax.lax.pmax(x, AXIS) if cfg.ndev > 1 else x

    def reduce_sum(x):
        return jax.lax.psum(x, AXIS) if cfg.ndev > 1 else x

    def step(carry: StepCarry) -> StepCarry:
        my = jax.lax.axis_index(AXIS) if cfg.ndev > 1 else jnp.zeros((), jnp.int32)
        st = carry.st
        dt = carry.dt_pre

        st, mig_ov = migrate(cfg, csp, st, my)

        # predictor
        st, fr1, ov1 = _sharded_interaction(cfg, csp, opts, st, my)
        velmax = reduce_max(I.velocity_max(csp, st.vel, st.code))
        acemax = reduce_max(I.ace_max(fr1.ace, st.code))
        viscdt = reduce_max(fr1.viscdtmax)
        dt_p, bad_p = I.dt_variable(csp, acemax, velmax, viscdt)

        pos_pre, vel_pre, rho_pre = st.pos, st.vel, st.rho
        pos1, vel1, rho1, code1 = I.symplectic_pre(
            csp, st.pos, st.vel, st.rho, st.code, fr1.ace, fr1.ar, dt)
        st = replace(st, pos=pos1, vel=vel1, rho=rho1, code=code1)

        # corrector
        st, fr2, ov2 = _sharded_interaction(cfg, csp, opts, st, my)
        velmax2 = reduce_max(I.velocity_max(csp, st.vel, st.code))
        acemax2 = reduce_max(I.ace_max(fr2.ace, st.code))
        viscdt2 = reduce_max(fr2.viscdtmax)
        dt_c, bad_c = I.dt_variable(csp, acemax2, velmax2, viscdt2)

        shiftdisp = None
        if opts.shiftmode != TpShifting.NONE:
            shiftdisp = F.apply_shifting(csp, opts, dt, st.vel, st.code,
                                         fr2.shiftposfs, fr2.shift_blocked)
        pos2, vel2, rho2, code2 = I.symplectic_corr(
            csp, pos_pre, vel_pre, rho_pre, st.rho, st.code,
            fr2.ace, fr2.ar, dt, shiftdisp)
        st = replace(st, pos=pos2, vel=vel2, rho=rho2, code=code2)

        overflow = reduce_max(jnp.maximum(jnp.maximum(ov1, ov2), mig_ov))
        return StepCarry(
            st=st, t=carry.t + dt, dt_pre=jnp.minimum(dt_p, dt_c),
            verlet_count=carry.verlet_count, nstep=carry.nstep + 1,
            overflow=jnp.maximum(carry.overflow, overflow),
            dtmodif=carry.dtmodif + bad_p.astype(jnp.int32)
                    + bad_c.astype(jnp.int32),
            tabs=None if carry.tabs is None else carry.tabs + dt)

    return step


def make_sharded_advance(cfg: ShardCfg, csp: CteSph, opts: SolverOpts,
                         mesh: Mesh):
    """Jitted advance(carry, t_target) over the mesh: the global carry holds
    particle arrays sharded on axis 0 ((ndev*n_local, ...)) and replicated
    scalars."""
    step = make_sharded_step(cfg, csp, opts)

    def advance(carry: StepCarry, t_target, nstep_max):
        def body(c):
            return step(c)

        def cond(c):
            return (c.t < t_target) & (c.nstep < nstep_max)

        return jax.lax.while_loop(cond, body, carry)

    def specs_like(carry: StepCarry) -> StepCarry:
        st = carry.st
        shard = lambda a: None if a is None else P(AXIS)
        pst = SimState(pos=P(AXIS), vel=P(AXIS), rho=P(AXIS), code=P(AXIS),
                       idp=P(AXIS), velm1=shard(st.velm1),
                       rhom1=shard(st.rhom1), spstau=shard(st.spstau))
        return StepCarry(st=pst, t=P(), dt_pre=P(), verlet_count=P(),
                         nstep=P(), overflow=P(), dtmodif=P(),
                         tabs=None if carry.tabs is None else P())

    def wrap(carry: StepCarry, t_target,
             nstep_max=jnp.asarray(2 ** 30, jnp.int32)):
        pspec_carry = specs_like(carry)
        # check_vma=False: pallas_call out_shapes do not carry vma metadata
        sharded = shard_map(advance, mesh=mesh,
                            in_specs=(pspec_carry, P(), P()),
                            out_specs=pspec_carry, check_vma=False)
        return sharded(carry, t_target, nstep_max)

    return jax.jit(wrap)


# ---------------------------------------------------------------------------
# host-side distribution
# ---------------------------------------------------------------------------

def shard_state(cfg: ShardCfg, st: SimState) -> SimState:
    """Distribute a (capacity n) canonical state into the (ndev*n_local)
    sharded layout by owner slab (host-side, done once at init)."""
    names, arrs = _state_arrays(st)
    arrs = [np.asarray(a) for a in arrs]
    d = dict(zip(names, arrs))
    code = d["code"]
    live = (np.right_shift(code, td.CODE_SPECIAL_SHIFT) & td.CODE_SPECIAL_MASK) \
        < td.SPECIAL_OUT_POS
    xcell = np.floor((d["pos"][:, 0] - cfg.gdom.posmin[0]) / cfg.gdom.scell
                     ).astype(np.int64)
    owner = np.clip(xcell // cfg.ncx_loc, 0, cfg.ndev - 1)
    out = {nm: np.zeros((cfg.ndev * cfg.n_local,) + a.shape[1:], a.dtype)
           for nm, a in d.items()}
    out["code"][:] = _DEAD
    out["pos"][:] = -1e6
    out["rho"][:] = 1000.0
    for dev in range(cfg.ndev):
        sel = np.where(live & (owner == dev))[0]
        if len(sel) > cfg.n_local:
            raise ValueError(f"shard {dev} needs {len(sel)} slots > n_local="
                             f"{cfg.n_local}")
        lo = dev * cfg.n_local
        for nm, a in d.items():
            out[nm][lo:lo + len(sel)] = a[sel]
    kw = {nm: jnp.asarray(v) for nm, v in out.items()}
    for nm in ("velm1", "rhom1", "spstau"):
        kw.setdefault(nm, None)
    return SimState(**kw)


# ---------------------------------------------------------------------------
# driver-facing dry run
# ---------------------------------------------------------------------------

def dryrun(n_devices: int) -> None:
    """Build an n-device mesh, jit the FULL sharded step (migration + halo
    exchange + fused forces + global dt reduction) on a tiny 3D dam break,
    and execute one advance."""
    from ..models import cases
    from ..typesdef import TpDensity

    if len(jax.devices()) < n_devices:
        # force the virtual-CPU platform if the backend isn't up yet (the
        # axon sitecustomize overrides JAX_PLATFORMS in the environment)
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        if len(jax.devices()) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(jax.devices())}")

    devs = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devs), (AXIS,))

    case = cases.dambreak3d(dp=0.06, tank=(0.9, 0.3, 0.3),
                            column=(0.3, 0.3, 0.2), obstacle=False)
    opts = SolverOpts(tdensity=TpDensity.FOURTAKAS)
    n_local = case.state.n  # safe capacity: any shard could hold everything
    cfg = make_shard_cfg(case.dom, n_devices, n_local)
    st = shard_state(cfg, case.state)
    carry = make_carry(st, case.csp)
    advance = make_sharded_advance(cfg, case.csp, opts, mesh)
    out = advance(carry, jnp.asarray(2e-4, jnp.float32))
    jax.block_until_ready(out.st.pos)
    assert int(out.nstep) >= 1, "sharded step did not run"
    assert int(out.overflow) == 0, f"overflow={int(out.overflow)}"
    print(f"dryrun_multichip({n_devices}): OK — nstep={int(out.nstep)}, "
          f"t={float(out.t):.2e}, dt={float(out.dt_pre):.2e}")
