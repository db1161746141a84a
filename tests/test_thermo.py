"""Unit tests for the thermodynamics library.

Mirrors the reference's test_phymbl.f90 strategy (SURVEY.md §4.1):
analytic-vs-finite-difference derivative checks, q_sat cross-checks,
theta/pressure round trips.
"""

import jax.numpy as jnp
import numpy as np

from aerobulk_tpu import constants as c
from aerobulk_tpu import thermo


def test_fsign_matches_fortran_sign():
    a = jnp.array([1.5, -2.0, 3.0, -4.0])
    b = jnp.array([2.0, 5.0, -1.0, -0.0])
    # SIGN(a,b): |a| with the sign bit of b (so SIGN(x, -0.0) < 0)
    out = thermo.fsign(a, b)
    np.testing.assert_allclose(out, [1.5, 2.0, -3.0, -4.0])


def test_e_sat_reference_point():
    # At 20 degC the Goff formula gives ~2339 Pa (WMO tables: 2338.8)
    e = float(thermo.e_sat(jnp.float64(293.15)))
    assert 2320.0 < e < 2350.0
    # and the Magnus-style sanity: e_sat(30C)/e_sat(10C) ~ 3.45
    r = float(thermo.e_sat(jnp.float64(303.15)) / thermo.e_sat(jnp.float64(283.15)))
    assert 3.3 < r < 3.6


def test_de_sat_dt_ice_matches_finite_difference():
    T = jnp.linspace(220.0, 273.0, 50)
    dT = 1.0e-4
    fd = (thermo.e_sat_ice(T + dT) - thermo.e_sat_ice(T - dT)) / (2 * dT)
    np.testing.assert_allclose(thermo.de_sat_dt_ice(T), fd, rtol=1e-6)


def test_dq_sat_dt_ice_matches_finite_difference():
    T = jnp.linspace(220.0, 273.0, 50)
    P = jnp.full_like(T, 101000.0)
    dT = 1.0e-4
    fd = (thermo.q_sat(T + dT, P, l_ice=True)
          - thermo.q_sat(T - dT, P, l_ice=True)) / (2 * dT)
    np.testing.assert_allclose(thermo.dq_sat_dt_ice(T, P), fd, rtol=1e-6)


def test_e_sat_ice_below_water_at_freezing():
    # over ice, saturation pressure is lower than over (supercooled) water
    T = jnp.linspace(250.0, 272.0, 20)
    assert bool(jnp.all(thermo.e_sat_ice(T) < thermo.e_sat(T)))


def test_theta_abs_roundtrip():
    slp = jnp.full((5,), 101000.0)
    Ta = jnp.linspace(260.0, 310.0, 5)
    q = jnp.full((5,), 0.01)
    for z in (2.0, 10.0, 30.0):
        theta = thermo.theta_from_z_p0_t_q(z, slp, Ta, q)
        Ta_back = thermo.t_from_z_p0_theta_q(z, slp, theta, q)
        # the reference's T_from_z_P0_Theta_q uses a fixed 4 iterations,
        # which converges to ~1e-7 relative — same bound here
        np.testing.assert_allclose(Ta_back, Ta, rtol=1e-6)


def test_theta_exceeds_abs_temp_above_sea_level():
    slp = jnp.array([101000.0])
    Ta = jnp.array([293.15])
    q = jnp.array([0.012])
    th = thermo.theta_from_z_p0_t_q(2.0, slp, Ta, q)
    # golden value from doc/ex_ab.dat: 20.01341 degC for 20 degC at 2 m
    np.testing.assert_allclose(th - c.rt0, 20.01341, atol=2e-5)


def test_q_air_rh_dp_consistency():
    # q -> rh -> q and q -> e -> dp-ish roundtrips
    slp = jnp.full((4,), 101000.0)
    Ta = jnp.linspace(280.0, 300.0, 4)
    q = jnp.full((4,), 0.008)
    rh = thermo.rh_air(q, Ta, slp)
    q_back = thermo.q_air_rh(rh, Ta, slp)
    np.testing.assert_allclose(q_back, q, rtol=1e-6)


def test_rho_air_bounds():
    rho = thermo.rho_air(jnp.array([288.0]), jnp.array([0.01]),
                         jnp.array([101000.0]))
    assert 1.1 < float(rho[0]) < 1.3
    # floor at 0.8 for absurd inputs
    rho = thermo.rho_air(jnp.array([1000.0]), jnp.array([0.0]),
                         jnp.array([1000.0]))
    assert float(rho[0]) == 0.8


def test_one_on_l_cap():
    big = thermo.one_on_l(jnp.array([280.0]), jnp.array([0.01]),
                          jnp.array([1e-12]), jnp.array([5.0]),
                          jnp.array([0.01]))
    assert abs(float(big[0])) <= 200.0


def test_z0tq_lkb_piecewise():
    z0 = jnp.full((6,), 1.0e-4)
    rer = jnp.array([0.05, 0.5, 5.0, 50.0, 500.0, 2000.0])
    z0t = thermo.z0tq_lkb(1, rer, z0)
    z0q = thermo.z0tq_lkb(2, rer, z0)
    assert z0t.shape == rer.shape
    # out-of-range Re_r saturates at the 0.05 m clamp (reference -999 path)
    assert float(z0t[-1]) == 0.05
    # in-range values are positive and bounded
    assert bool(jnp.all(z0t > 0)) and bool(jnp.all(z0t <= 0.05))
    assert bool(jnp.all(z0q > 0))
    # smooth-regime (Re_r<0.11): z0t/z0 = 0.177/Re_r ~ const*z0/Re_r
    np.testing.assert_allclose(float(z0t[0]), 0.177 * 1e-4 / 0.05, rtol=1e-12)


def test_bulk_formula_ice_branch():
    zu = 10.0
    ts = jnp.array([270.0]); qs = jnp.array([0.003])
    th = jnp.array([268.0]); qa = jnp.array([0.002])
    cd = jnp.array([1.4e-3])
    w = jnp.array([8.0])
    slp = jnp.array([101000.0])
    tau_i, qh_i, ql_i, ev_i, _ = thermo.bulk_formula(
        zu, ts, qs, th, qa, cd, cd, cd, w, w, slp, l_ice=True)
    tau_w, qh_w, ql_w, ev_w, _ = thermo.bulk_formula(
        zu, ts, qs, th, qa, cd, cd, cd, w, w, slp, l_ice=False)
    # same stress/sensible, but latent uses sublimation heat over ice
    np.testing.assert_allclose(tau_i, tau_w)
    np.testing.assert_allclose(qh_i, qh_w)
    np.testing.assert_allclose(float(ql_i[0] / ev_i[0]), c.rLsub)
    # evap clipped at 0 over ice
    assert float(ev_i[0]) <= 0.0


def test_gamma_moist_range():
    g = thermo.gamma_moist(jnp.array([290.0]), jnp.array([0.01]))
    assert 0.003 < float(g[0]) < 0.007   # moist rate < dry rate 9.8 K/km


def test_rho_air_adv_close_to_simple():
    Ta = jnp.array([288.0, 300.0])
    qa = jnp.array([0.008, 0.018])
    slp = jnp.array([101000.0, 100000.0])
    simple = thermo.rho_air(Ta, qa, slp)
    adv = thermo.rho_air_adv(Ta, qa, slp)
    np.testing.assert_allclose(adv, simple, rtol=2e-3)


def test_q_sat_crude_vs_exact():
    ts = jnp.array([285.0, 295.0, 305.0])
    slp = jnp.full((3,), 101000.0)
    rho = thermo.rho_air(ts, jnp.zeros(3), slp)
    crude = thermo.q_sat_crude(ts, rho)
    exact = thermo.q_sat(ts, slp)
    np.testing.assert_allclose(crude, exact, rtol=0.06)  # a crude formula


def test_dry_static_energy():
    s = thermo.dry_static_energy(10.0, jnp.array([290.0]),
                                 jnp.array([0.01]))
    expected = 9.8 * 10.0 + (1005.0 + 1860.0 * 0.01) * 290.0
    np.testing.assert_allclose(float(s[0]), expected, rtol=1e-12)


def test_update_qnsol_tau_consistency():
    """Qns == Qlat + Qsen + Qlw_net with the coefficients implied by the
    turbulent scales."""
    zu = 10.0
    ts = jnp.array([295.0]); qs = jnp.array([0.017])
    th = jnp.array([293.0]); qa = jnp.array([0.012])
    us = jnp.array([0.2]); tst = jnp.array([-0.05]); qst = jnp.array([-3e-4])
    wnd = jnp.array([5.0]); ub = jnp.array([5.1])
    slp = jnp.array([101000.0]); rlw = jnp.array([370.0])
    qns, tau, qlat = thermo.update_qnsol_tau(zu, ts, qs, th, qa, us, tst,
                                             qst, wnd, ub, slp, rlw)
    z = us / ub
    t2, qh2, ql2, _, _ = thermo.bulk_formula(
        zu, ts, qs, th, qa, z * z, z * tst / (th - ts), z * qst / (qa - qs),
        wnd, ub, slp)
    qlw = thermo.qlw_net(rlw, ts)
    np.testing.assert_allclose(float(qns[0]),
                               float(ql2[0] + qh2[0] + qlw[0]), rtol=1e-12)
    np.testing.assert_allclose(float(tau[0]), float(t2[0]), rtol=1e-12)
    np.testing.assert_allclose(float(qlat[0]), float(ql2[0]), rtol=1e-12)


def test_variance_vmean():
    """VARIANCE/VMEAN parity (mod_phymbl.f90:1794-1822) — the reference's
    VARIANCE returns the population *standard deviation* (sqrt applied)."""
    rng = np.random.default_rng(3)
    x = rng.normal(2.0, 1.5, 1000)
    np.testing.assert_allclose(float(thermo.vmean(x)), x.mean(), rtol=1e-12)
    np.testing.assert_allclose(float(thermo.variance(x)),
                               np.sqrt(((x - x.mean()) ** 2).mean()),
                               rtol=1e-12)


def test_profiler_report():
    import time as _time
    from aerobulk_tpu.profiling import Profiler
    prof = Profiler()
    with prof.stage("a"):
        _time.sleep(0.01)
    with prof.stage("a"):
        _time.sleep(0.01)
    rep = prof.report()
    assert "a" in rep and prof.counts["a"] == 2
    assert prof.totals["a"] >= 0.02
