"""Row-padded amortized divide (celldiv.RowDiv) + the rows kernel path.

Validates the Verlet-list-at-the-window-level contract: trajectories from
the amortized path must match the per-step jnp bucket path (the oracle-backed
reference layout) to f32 tolerance, including across forced rebuilds."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualsphysics_multilayer_tpu import typesdef as td
from dualsphysics_multilayer_tpu.models import cases
from dualsphysics_multilayer_tpu.models.wcsph import (make_carry, make_step,
                                                      _rowdiv_ok)
from dualsphysics_multilayer_tpu.ops import celldiv as cd
from dualsphysics_multilayer_tpu.ops.forces import SolverOpts
from dualsphysics_multilayer_tpu.ops.pallas import cellforce as CF


def _case(dp=0.04):
    return cases.dambreak2d(dp=dp)


@pytest.mark.parametrize("mode", ["merged2d", "merged3d", "chopped"])
def test_divide_rows_structure(mode, monkeypatch):
    if mode == "merged3d":
        case = cases.dambreak3d(dp=0.06)
    else:
        case = _case()
    if mode == "chopped":
        # force the x-tile chop + per-row (non-merged) window path, which
        # large domains (ncx > ROWDIV_SX) take
        monkeypatch.setattr(cd, "ROWDIV_SX", 8)
        assert not cd.rowdiv_merged(case.dom)
    else:
        assert cd.rowdiv_merged(case.dom)
    dom, st = case.dom, case.state
    T, W = CF.tiles_rows(dom)
    NP = cd.rowdiv_capacity(dom, st.n, T)
    pad = NP - st.n
    pos = jnp.pad(st.pos, ((0, pad), (0, 0)))
    code = jnp.pad(st.code, (0, pad),
                   constant_values=np.uint32(td.code_make(
                       td.TYPE_FIXED, 0, td.SPECIAL_OUT_IGNORE)))
    rd, code2 = cd.divide_rows(dom, pos, code, tile_t=T, tile_w=W)
    assert int(rd.overflow) == 0
    perm = np.asarray(rd.perm)
    live = perm[perm < NP]
    # every live particle appears exactly once
    assert len(np.unique(live)) == len(live) == st.n
    assert int(rd.used) % T == 0
    # block starts implicit: every slot below used belongs to a block whose
    # tcount covers it or is a row-tail pad
    tcount = np.asarray(rd.tcount)
    A = NP // T
    assert tcount.shape == (A,)
    assert int(rd.nactive) == int((tcount > 0).sum())
    # active blocks form a prefix
    nact = int(rd.nactive)
    assert (tcount[:nact] > 0).all() and (tcount[nact:] == 0).all()

    # window correctness: for each live slot, every live neighbour within
    # kernelsize must fall inside one of its block's 9 windows
    posn = np.asarray(pos)[live]
    slot_of = np.full(NP, -1, np.int64)
    slots = np.where(perm < NP)[0]
    ks = case.csp.kernelsize
    # brute force on a subsample
    rng = np.random.default_rng(0)
    sub = rng.choice(len(slots), size=min(100, len(slots)), replace=False)
    wstart = np.asarray(rd.wstart)
    wcount = np.asarray(rd.wcount)
    pos_by_slot = np.zeros((NP, 3))
    pos_by_slot[slots] = np.asarray(pos)[perm[slots]]
    live_slot = np.zeros(NP, bool)
    live_slot[slots] = True
    for i in sub:
        s = slots[i]
        b = s // T
        p = pos_by_slot[s]
        d = np.linalg.norm(pos_by_slot - p, axis=1)
        nbrs = np.where(live_slot & (d <= ks))[0]
        covered = np.zeros_like(nbrs, bool)
        for r in range(wstart.shape[1]):
            w0, wc = wstart[b, r], wcount[b, r]
            covered |= (nbrs >= w0) & (nbrs < w0 + wc)
        assert covered.all(), f"slot {s}: neighbours outside windows"


def _run_steps(case, opts, nsteps, dom_for_carry=None):
    step = make_step(case.csp, opts, case.dom)
    carry = make_carry(case.state, case.csp, opts, dom=dom_for_carry)
    stepj = jax.jit(step)
    for _ in range(nsteps):
        carry = stepj(carry)
    return carry


def _sorted_by_idp(carry):
    act = np.asarray(td.is_active(carry.st.code))
    idp = np.asarray(carry.st.idp)
    order = np.argsort(np.where(act, idp, 2 ** 31), kind="stable")
    nl = int(act.sum())
    return np.asarray(carry.st.pos)[order[:nl]], nl


def test_rowdiv_matches_bucket_path():
    case = _case()
    opts = SolverOpts(tdensity=td.TpDensity.FOURTAKAS, use_pallas=True)
    assert _rowdiv_ok(case.csp, opts, case.dom, None)
    c_rd = _run_steps(case, opts, 20, dom_for_carry=case.dom)
    assert c_rd.rdiv is not None
    assert int(c_rd.overflow) == 0
    c_ref = _run_steps(case, dataclasses.replace(opts, use_pallas=False), 20)
    p1, n1 = _sorted_by_idp(c_rd)
    p2, n2 = _sorted_by_idp(c_ref)
    assert n1 == n2
    assert abs(float(c_rd.t) - float(c_ref.t)) < 1e-7
    np.testing.assert_allclose(p1, p2, atol=5e-6)


def test_rowdiv_forced_rebuilds():
    """Zero-margin domain -> the trigger fires every step; trajectories must
    still match (rebuild correctness) and nrebuild counts the rebuilds."""
    case = _case()
    # rebuild margin ~0: shrink the skin to (almost) nothing
    dom0 = dataclasses.replace(case.dom, scell=case.csp.kernelsize * 1.0005)
    case0 = dataclasses.replace(case, dom=dom0)
    opts = SolverOpts(tdensity=td.TpDensity.FOURTAKAS, use_pallas=True)
    c0 = _run_steps(case0, opts, 12, dom_for_carry=dom0)
    assert int(c0.nrebuild) >= 10
    c_ref = _run_steps(case, dataclasses.replace(opts, use_pallas=False), 12)
    p1, n1 = _sorted_by_idp(c0)
    p2, n2 = _sorted_by_idp(c_ref)
    assert n1 == n2
    np.testing.assert_allclose(p1, p2, atol=5e-6)
