"""Pallas cell-tile force kernel vs the O(N^2) oracle (interpret mode on CPU;
the same kernel compiles for real on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dualsphysics_multilayer_tpu import typesdef as td
from dualsphysics_multilayer_tpu.ops import celldiv as cd
from dualsphysics_multilayer_tpu.ops import eos
from dualsphysics_multilayer_tpu.ops import forces as F
from dualsphysics_multilayer_tpu.ops.pallas import cellforce as CF
from dualsphysics_multilayer_tpu.typesdef import TpDensity, make_ctesph

from ref_naive import naive_forces
from test_forces import make_cloud, assert_close


def run_pallas(csp, opts, pos, vel, rho, code, spstau=None):
    # random clouds exceed the dp-lattice occupancy bound; use explicit cellcap
    dom = cd.make_domain(pos.min(0) - 0.01, pos.max(0) + 0.01, csp.kernelsize,
                         simulate2d=csp.simulate2d, cellcap=64)
    T, W = CF.tiles_for(dom)
    sd, code2 = cd.divide_sorted(dom, jnp.asarray(pos, jnp.float32),
                                 jnp.asarray(code), tile_t=T, tile_w=W,
                                 group_sx=CF.GROUP_SX,
                                 maxgroups=CF.maxgroups_for(dom, len(pos)))
    assert int(sd.overflow) == 0
    return CF.interaction_forces_pallas(
        csp, opts, dom, sd, jnp.asarray(pos, jnp.float32),
        jnp.asarray(vel, jnp.float32), jnp.asarray(rho, jnp.float32),
        code2, interpret=True,
        spstau=None if spstau is None else jnp.asarray(spstau, jnp.float32))


@pytest.mark.parametrize("sim2d", [False, True])
@pytest.mark.parametrize("tdensity", [TpDensity.NONE, TpDensity.MOLTENI,
                                      TpDensity.FOURTAKAS,
                                      TpDensity.FOURTAKAS_FULL])
def test_pallas_forces_match_oracle(sim2d, tdensity):
    csp = make_ctesph(simulate2d=sim2d, dp=0.05, hswl=0.25, visco=0.05)
    opts = F.SolverOpts(tdensity=tdensity, use_pallas=True)
    assert CF.supports(csp, opts)
    pos, vel, rho, code, nb = make_cloud(sim2d=sim2d, seed=12)
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code)
    got = run_pallas(csp, opts, pos, vel, rho, code)
    assert_close(want, got)


def test_pallas_viscoboundfactor():
    csp = make_ctesph(simulate2d=False, dp=0.05, hswl=0.25, visco=0.05,
                      viscoboundfactor=0.3)
    opts = F.SolverOpts(tdensity=TpDensity.NONE, use_pallas=True)
    pos, vel, rho, code, nb = make_cloud(seed=13)
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code)
    got = run_pallas(csp, opts, pos, vel, rho, code)
    assert_close(want, got)


@pytest.mark.parametrize("mode", [1, 2, 3])  # NO_BOUND, NO_FIXED, FULL
def test_pallas_shifting_matches_oracle(mode):
    from dualsphysics_multilayer_tpu.typesdef import TpShifting
    csp = make_ctesph(simulate2d=False, dp=0.05, hswl=0.25, visco=0.05)
    opts = F.SolverOpts(tdensity=TpDensity.FOURTAKAS, use_pallas=True,
                        shiftmode=TpShifting(mode))
    assert CF.supports(csp, opts)
    pos, vel, rho, code, nb = make_cloud(seed=21)
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code)
    got = run_pallas(csp, opts, pos, vel, rho, code)
    assert_close(want, got)
    scale = np.abs(want["shiftposfs"]).max() + 1e-6
    np.testing.assert_allclose(np.asarray(got.shiftposfs),
                               want["shiftposfs"],
                               atol=2e-3 * scale, rtol=2e-3)
    np.testing.assert_array_equal(np.asarray(got.shift_blocked),
                                  want["shift_blocked"])


@pytest.mark.parametrize("tdensity", [TpDensity.MOLTENI, TpDensity.FOURTAKAS])
def test_pallas_floating_matches_oracle(tdensity):
    """Floating particles: fluid-side momentum, DDT exclusion/blocking."""
    csp = make_ctesph(simulate2d=False, dp=0.05, hswl=0.25, visco=0.05)
    opts = F.SolverOpts(tdensity=tdensity, use_pallas=True,
                        with_floating=True)
    assert CF.supports(csp, opts)
    pos, vel, rho, code, nb = make_cloud(seed=22)
    code = np.array(code)
    # convert a slab of fluid into a floating body (same mass as fluid so the
    # ftomassp-free oracle matches)
    ft = np.zeros(len(code), bool)
    ft[nb:nb + 20] = True
    code[ft] = td.code_make(td.TYPE_FLOATING, 0)
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code)
    got = run_pallas(csp, opts, pos, vel, rho, code)
    assert_close(want, got)


@pytest.mark.parametrize("sim2d", [False, True])
def test_pallas_laminar_sps_matches_oracle(sim2d):
    """Laminar operator + SPS stress divergence + gradvel accumulation in
    the fused kernel (JSphCpu.cpp:765-791)."""
    from dualsphysics_multilayer_tpu.typesdef import TpVisco
    csp = make_ctesph(simulate2d=sim2d, dp=0.05, hswl=0.25, visco=1e-4)
    opts = F.SolverOpts(tdensity=TpDensity.FOURTAKAS,
                        tvisco=TpVisco.LAMINAR_SPS, use_pallas=True)
    assert CF.supports(csp, opts)
    pos, vel, rho, code, nb = make_cloud(sim2d=sim2d, seed=7)
    rng = np.random.default_rng(5)
    spstau = (rng.normal(size=(len(pos), 6)) * 1e-3).astype(np.float32)
    isfl = np.asarray(td.code_type(code) == td.TYPE_FLUID)
    spstau[~isfl] = 0.0
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code, spstau=spstau)
    got = run_pallas(csp, opts, pos, vel, rho, code, spstau=spstau)
    assert_close(want, got)
    assert got.spsgradvel is not None
    scale = np.abs(want["gradvel"]).max() + 1e-12
    np.testing.assert_allclose(np.asarray(got.spsgradvel), want["gradvel"],
                               atol=2e-4 * scale)


# ---------------------------------------------------------------------------
# rows-path (RowDiv) kernels — the v1 whole-window kernel (merged / per-row
# windows) and the v3 trimmed-window kernel (group-union DMAs, roll-aligned
# chunks, fast-channel body); all validated against the same oracle
# ---------------------------------------------------------------------------

def run_rows(csp, opts, pos, vel, rho, code, merged=True, kill_some=0,
             v3=False, env=None):
    """Run interaction_forces_rows (interpret mode) on a padded cloud and
    return Forces mapped back to canonical order.  ``kill_some`` marks the
    first k fluid particles excluded (OUT_POS) AFTER the divide, exercising
    the poisoned-dead-slot path (incl. a dead slot 0 of some block).
    ``v3`` builds the v3 group tables so the v3 kernel runs; ``env`` sets
    knob overrides (DSPH_FASTBODY / DSPH_ROLL / DSPH_WU / DSPH_K...) for
    the duration of the call."""
    import os
    dom = cd.make_domain(pos.min(0) - 0.01, pos.max(0) + 0.01, csp.kernelsize,
                         simulate2d=csp.simulate2d, cellcap=64)
    saved = {}
    env = dict(env or {})
    if not merged:
        env["DSPH_ROWDIV_MERGED"] = "0"
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        T, W = CF.tiles_rows(dom)
        n = len(pos)
        NP = cd.rowdiv_capacity(dom, n, T)
        pad = NP - n
        deadc = np.uint32(td.code_make(td.TYPE_FIXED, 0,
                                       td.SPECIAL_OUT_IGNORE))
        posp = jnp.pad(jnp.asarray(pos, jnp.float32), ((0, pad), (0, 0)))
        codep = jnp.pad(jnp.asarray(code), (0, pad), constant_values=deadc)
        rd, code2 = cd.divide_rows(dom, posp, codep, tile_t=T, tile_w=W,
                                   v3=CF.v3_params(dom, NP) if v3 else None)
        assert int(rd.overflow) == 0

        velp = jnp.pad(jnp.asarray(vel, jnp.float32), ((0, pad), (0, 0)))
        rhop = jnp.pad(jnp.asarray(rho, jnp.float32), (0, pad),
                       constant_values=1.0)
        if kill_some:
            kill = np.zeros(NP, bool)
            kill[np.where(np.asarray(td.code_type(code2))
                          == td.TYPE_FLUID)[0][:kill_some]] = True
            code2 = jnp.where(jnp.asarray(kill),
                              td.code_set_special(code2, td.SPECIAL_OUT_POS),
                              code2)

        def to_slots(a, fill=0.0):
            return cd.gather(a, rd.perm, fill=fill)

        code_s = jnp.where(rd.perm < NP,
                           jnp.take(code2, jnp.minimum(rd.perm, NP - 1)),
                           deadc)
        fr = CF.interaction_forces_rows(
            csp, opts, dom, rd, to_slots(posp), to_slots(velp),
            to_slots(rhop, fill=1.0), code_s, interpret=True)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    # map slot-order Forces back to canonical order
    perm = np.asarray(rd.perm)
    slots = np.where(perm < NP)[0]
    inv = np.full(NP, -1, np.int64)
    inv[perm[slots]] = slots

    def back(a):
        if a is None:
            return None
        a = np.asarray(a)
        out = np.zeros((n,) + a.shape[1:], a.dtype)
        out[inv[:n] >= 0] = a[inv[:n][inv[:n] >= 0]]
        return out

    import dataclasses
    fr2 = dataclasses.replace(
        fr, ace=back(fr.ace), ar=back(fr.ar),
        shiftposfs=back(fr.shiftposfs), shift_blocked=back(fr.shift_blocked))
    return fr2, np.asarray(td.is_active(code2))[:n]


@pytest.mark.parametrize("merged", [True, False])
@pytest.mark.parametrize("tdensity", [TpDensity.NONE, TpDensity.MOLTENI,
                                      TpDensity.FOURTAKAS,
                                      TpDensity.FOURTAKAS_FULL])
def test_rows_v1_matches_oracle(merged, tdensity):
    """v1 rows kernel (whole-window sweep, merged and per-row layouts)."""
    csp = make_ctesph(simulate2d=False, dp=0.05, hswl=0.25, visco=0.05)
    opts = F.SolverOpts(tdensity=tdensity, use_pallas=True)
    pos, vel, rho, code, nb = make_cloud(seed=31)
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code)
    got, _ = run_rows(csp, opts, pos, vel, rho, code, merged=merged)
    assert_close(want, got)


def test_rows_v1_shifting_and_visco():
    from dualsphysics_multilayer_tpu.typesdef import TpShifting
    csp = make_ctesph(simulate2d=False, dp=0.05, hswl=0.25, visco=0.05,
                      viscoboundfactor=0.3)
    opts = F.SolverOpts(tdensity=TpDensity.FOURTAKAS, use_pallas=True,
                        shiftmode=TpShifting.NO_FIXED)
    pos, vel, rho, code, nb = make_cloud(seed=33)
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code)
    got, _ = run_rows(csp, opts, pos, vel, rho, code)
    assert_close(want, got)
    scale = np.abs(want["shiftposfs"]).max() + 1e-6
    np.testing.assert_allclose(np.asarray(got.shiftposfs),
                               want["shiftposfs"],
                               atol=2e-3 * scale, rtol=2e-3)
    np.testing.assert_array_equal(np.asarray(got.shift_blocked),
                                  want["shift_blocked"])


def test_rows_v1_dead_slots():
    """Particles excluded AFTER the divide (stale dead slots, incl. possibly
    a block's slot 0) must contribute nothing and break nothing — the
    remaining live particles see forces as if the dead ones never existed."""
    csp = make_ctesph(simulate2d=False, dp=0.05, hswl=0.25, visco=0.05)
    opts = F.SolverOpts(tdensity=TpDensity.FOURTAKAS, use_pallas=True)
    pos, vel, rho, code, nb = make_cloud(seed=35)
    got, live = run_rows(csp, opts, pos, vel, rho, code, kill_some=17)
    assert (~live).sum() == 17
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos[live], vel[live], rho[live],
                        press[live], code[live])
    np.testing.assert_allclose(np.asarray(got.ace)[live], want["ace"],
                               atol=2e-3 * (np.abs(want["ace"]).max() + 1e-6),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got.ar)[live], want["ar"],
                               atol=2e-3 * (np.abs(want["ar"]).max() + 1e-6),
                               rtol=2e-3)


# ---------------------------------------------------------------------------
# v3 trimmed-window kernel (the DEFAULT rows hot path): direct oracle tests
# over its own dispatch knobs — fast-channel vs canonical body, roll-aligned
# vs masked chunks, the wide-group fallback, and stale dead slots
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fastbody", ["0", "1"])
@pytest.mark.parametrize("tdensity", [TpDensity.NONE, TpDensity.MOLTENI,
                                      TpDensity.FOURTAKAS,
                                      TpDensity.FOURTAKAS_FULL])
def test_rows_v3_matches_oracle(fastbody, tdensity):
    csp = make_ctesph(simulate2d=False, dp=0.05, hswl=0.25, visco=0.05)
    opts = F.SolverOpts(tdensity=tdensity, use_pallas=True)
    assert CF.v3_ok(csp, opts)
    pos, vel, rho, code, nb = make_cloud(seed=41)
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code)
    got, _ = run_rows(csp, opts, pos, vel, rho, code, v3=True,
                      env={"DSPH_FASTBODY": fastbody})
    assert_close(want, got)


@pytest.mark.parametrize("roll", ["0", "1"])
def test_rows_v3_roll_modes(roll):
    """Masked (DSPH_ROLL=0) and roll-aligned (=1) chunk processing agree
    with the oracle; shifting + viscoboundfactor active."""
    from dualsphysics_multilayer_tpu.typesdef import TpShifting
    csp = make_ctesph(simulate2d=False, dp=0.05, hswl=0.25, visco=0.05,
                      viscoboundfactor=0.3)
    opts = F.SolverOpts(tdensity=TpDensity.FOURTAKAS, use_pallas=True,
                        shiftmode=TpShifting.NO_BOUND)
    pos, vel, rho, code, nb = make_cloud(seed=43)
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code)
    got, _ = run_rows(csp, opts, pos, vel, rho, code, v3=True,
                      env={"DSPH_ROLL": roll})
    assert_close(want, got)
    scale = np.abs(want["shiftposfs"]).max() + 1e-6
    np.testing.assert_allclose(np.asarray(got.shiftposfs),
                               want["shiftposfs"],
                               atol=2e-3 * scale, rtol=2e-3)
    np.testing.assert_array_equal(np.asarray(got.shift_blocked),
                                  want["shift_blocked"])


def test_rows_v3_wide_groups():
    """DSPH_WU=128 forces (nearly) every group onto the wide-fallback call —
    the compacted wide tables and the narrow/wide inverse map must still
    reproduce the oracle."""
    csp = make_ctesph(simulate2d=False, dp=0.05, hswl=0.25, visco=0.05)
    opts = F.SolverOpts(tdensity=TpDensity.FOURTAKAS, use_pallas=True)
    pos, vel, rho, code, nb = make_cloud(seed=45)
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code)
    got, _ = run_rows(csp, opts, pos, vel, rho, code, v3=True,
                      env={"DSPH_WU": "128", "DSPH_K": "2"})
    assert_close(want, got)


def test_rows_v3_dead_slots():
    """Stale dead slots on the v3 path (fast body): poisoned positions must
    self-mask out of every accumulator."""
    csp = make_ctesph(simulate2d=False, dp=0.05, hswl=0.25, visco=0.05)
    opts = F.SolverOpts(tdensity=TpDensity.FOURTAKAS, use_pallas=True)
    pos, vel, rho, code, nb = make_cloud(seed=47)
    got, live = run_rows(csp, opts, pos, vel, rho, code, kill_some=17,
                         v3=True)
    assert (~live).sum() == 17
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos[live], vel[live], rho[live],
                        press[live], code[live])
    np.testing.assert_allclose(np.asarray(got.ace)[live], want["ace"],
                               atol=2e-3 * (np.abs(want["ace"]).max() + 1e-6),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got.ar)[live], want["ar"],
                               atol=2e-3 * (np.abs(want["ar"]).max() + 1e-6),
                               rtol=2e-3)


def test_rows_v3_chunked_groups():
    """DSPH_GCHUNK=8 forces the group table through multiple lax.map chunks
    (the 10M-scale configuration where the unrolled chunk loop would have
    compiled ~120 kernel copies) — results must match the oracle."""
    csp = make_ctesph(simulate2d=False, dp=0.05, hswl=0.25, visco=0.05)
    opts = F.SolverOpts(tdensity=TpDensity.FOURTAKAS, use_pallas=True)
    pos, vel, rho, code, nb = make_cloud(seed=49)
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code)
    got, _ = run_rows(csp, opts, pos, vel, rho, code, v3=True,
                      env={"DSPH_GCHUNK": "8"})
    assert_close(want, got)


def test_rows_v3_per_row_planes():
    """DSPH_MERGEBOUND=0 forces per-row window DMAs (PD == R, the layout
    every domain with rows longer than the merge bound uses — e.g. the 2M+
    dam breaks): plane indices up to R-1 must survive the descriptor
    packing and the flat loop must reproduce the oracle."""
    csp = make_ctesph(simulate2d=False, dp=0.05, hswl=0.25, visco=0.05)
    opts = F.SolverOpts(tdensity=TpDensity.FOURTAKAS, use_pallas=True)
    pos, vel, rho, code, nb = make_cloud(seed=51)
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code)
    got, _ = run_rows(csp, opts, pos, vel, rho, code, v3=True,
                      env={"DSPH_MERGEBOUND": "0"})
    assert_close(want, got)


def test_rows_v3_per_row_planes_2d():
    """Per-row planes in 2D (PD == 3) with the legacy masked chunks too."""
    csp = make_ctesph(simulate2d=True, dp=0.05, hswl=0.25, visco=0.05)
    opts = F.SolverOpts(tdensity=TpDensity.FOURTAKAS, use_pallas=True)
    pos, vel, rho, code, nb = make_cloud(seed=53, sim2d=True)
    press = np.asarray(eos.press_from_rho(csp, jnp.asarray(rho))).astype(np.float64)
    want = naive_forces(csp, opts, pos, vel, rho, press, code)
    got, _ = run_rows(csp, opts, pos, vel, rho, code, v3=True,
                      env={"DSPH_MERGEBOUND": "0"})
    assert_close(want, got)
