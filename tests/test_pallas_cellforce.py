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
