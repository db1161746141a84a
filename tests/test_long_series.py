"""Long-horizon stateful stress (VERDICT r2 item 6).

Two complements to the 5-day oracle of test_oracle_series.py:

* a 30-day (720 hourly records) scalar-oracle parity run spanning ~30
  dawn resets and repeated accumulator build/drain cycles (overcast and
  windy days are woven into the forcing to force ``Qnt_ac`` to drain
  mid-month) — the reference's year-long PAPA workload shape
  (test_aerobulk_buoy_series_oce.f90:364-537) compressed to a month;

* an fp32-vs-fp64 drift budget for the warm-layer state across the same
  720 steps: fp32 is the TPU speed path, and the skin schemes integrate
  O(1e6 J/m^2) accumulators across time — this pins how much the fp32
  trajectory can wander from the fp64 one over a month of hourly steps
  (measured values recorded in docs/SCALING.md "fp32 drift budget").
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from aerobulk_tpu import constants as c
from aerobulk_tpu.api import AeroBulkConfig, init_skin_state, run_series

from oracle import HITS, reset_hits
from oracle import phymbl as oph
from oracle import turb as otb

# depth tests: month-scale stateful scans — deselect with -m 'not slow' (make test-fast)
pytestmark = pytest.mark.slow

NT = 720           # 30 days of hourly records
NDAYS = NT // 24


def _weather_forcing(nt, npts, seed=404, seasonal=False):
    """``nt`` hourly records of forcing with real day-to-day weather
    variety: clear days (warm layer builds), overcast days (net cooling
    drains the accumulator), and wind bursts (momentum accumulator
    growth).  ``seasonal=True`` adds an annual SST/solar cycle for
    year-length runs."""
    rng = np.random.default_rng(seed)
    lon = np.linspace(0.0, 325.0, npts)             # spread of solar lags
    sst0 = 287.0 + 10.0 * rng.random(npts)
    ndays = -(-nt // 24)

    hours = np.arange(nt)
    day = hours // 24
    isecday = ((hours % 24) * 3600 + 1800).astype(int)

    season_sst = (2.5 * np.sin(2 * np.pi * hours / 8760.0)[:, None]
                  if seasonal else 0.0)
    season_amp = (1.0 - 0.35 * np.cos(2 * np.pi * day / 365.0)
                  if seasonal else 1.0)

    # day-to-day solar amplitude: every 4th day heavily overcast
    amp = (850.0 - 700.0 * (day % 4 == 3)
           + 80.0 * rng.standard_normal(ndays)[day]) * season_amp
    amp = np.maximum(amp, 60.0)
    # wind: calm baseline with 2-day bursts
    wind_base = 2.0 + 9.0 * (day % 7 >= 5) + 2.0 * rng.random(nt)

    f = {}
    f["sst"] = (sst0[None, :] + 0.8 * np.sin(hours / 96.0)[:, None]
                + season_sst + 0.05 * rng.normal(size=(nt, npts)))
    f["t_zt"] = (f["sst"] + 1.5 * np.sin(2 * np.pi * hours / 24.0)[:, None]
                 + rng.normal(0.0, 1.0, (nt, npts)))
    f["slp"] = 99000.0 + 3000.0 * rng.random((nt, npts))
    f["hum_zt"] = np.array(
        [[0.6 * oph.q_sat(f["t_zt"][t, i], f["slp"][t, i])
          for i in range(npts)] for t in range(nt)])
    f["U_zu"] = wind_base[:, None] + 1.5 * rng.random((nt, npts))
    f["V_zu"] = rng.normal(0.0, 2.0, (nt, npts))
    loc_h = (hours[:, None] + lon[None, :] / 15.0) % 24.0
    f["rad_sw"] = amp[:, None] * np.maximum(
        0.0, np.sin(np.pi * (loc_h - 6.0) / 12.0))
    f["rad_lw"] = 260.0 + 140.0 * rng.random((nt, npts))
    return f, isecday, lon


def _month_forcing(npts, seed=404):
    return _weather_forcing(NT, npts, seed=seed)


@pytest.mark.slow
def test_oracle_series_30day_coare_skin():
    """720-step scalar-chain parity at 1e-12, with asserted dawn resets,
    builds, drains, and commits along the way."""
    npts = 1
    f, isecday, lon = _month_forcing(npts)

    cfg = AeroBulkConfig(algo="coare3p6", zt=2.0, zu=10.0, niter=5,
                         use_skin=True)
    forcing = {k: jnp.asarray(v) for k, v in f.items()}
    outs, final_state = run_series(
        cfg, forcing, isecday_utc=jnp.asarray(isecday),
        lon=jnp.asarray(lon),
        skin_state=init_skin_state(cfg, (npts,), jnp.float64))

    reset_hits()
    ql = np.zeros((NT, npts))
    dtwl = np.zeros((NT, npts))
    states = [(0.0, 20.0, 0.0, 0.0)] * npts
    for t in range(NT):
        for i in range(npts):
            q = f["hum_zt"][t, i]
            wnd = math.sqrt(f["U_zu"][t, i] ** 2 + f["V_zu"][t, i] ** 2)
            ssq = c.rdct_qsat_salt * oph.q_sat(f["sst"][t, i],
                                               f["slp"][t, i])
            theta = oph.theta_from_z_p0_t_q(2.0, f["slp"][t, i],
                                            f["t_zt"][t, i], q)
            out, states[i] = otb.turb_coare_sc(
                "coare3p6", 2.0, 10.0, f["sst"][t, i], theta, ssq, q, wnd,
                niter=5, use_cs=True, use_wl=True,
                Qsw=(1.0 - c.roce_alb0) * f["rad_sw"][t, i],
                rad_lw=f["rad_lw"][t, i], slp=f["slp"][t, i],
                isecday_utc=int(isecday[t]), lon=lon[i],
                wl_state=states[i])
            _, _, QL, _, _ = oph.bulk_formula(
                10.0, out["T_s"], out["q_s"], out["t_zu"], out["q_zu"],
                out["Cd"], out["Ch"], out["Ce"], wnd, out["Ubzu"],
                f["slp"][t, i])
            ql[t, i] = QL
            dtwl[t, i] = out["dT_wl"]

    np.testing.assert_allclose(np.asarray(outs.QL), ql, rtol=1e-12,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(outs.diag.dT_wl), dtwl,
                               rtol=1e-12, atol=1e-13)
    exp_state = np.array(states)
    np.testing.assert_allclose(np.asarray(final_state.Qnt_ac),
                               exp_state[:, 2], rtol=1e-12, atol=1e-8)
    np.testing.assert_allclose(np.asarray(final_state.Tau_ac),
                               exp_state[:, 3], rtol=1e-12, atol=1e-10)

    # a month must exercise the full state machine repeatedly
    assert HITS["wl_dawn_reset"] >= 20, dict(HITS)   # ~30 dawns
    assert HITS["wl_built"] >= 100, dict(HITS)
    assert HITS["wl_drained"] >= 1, dict(HITS)       # overcast days drain
    assert HITS["wl_commit"] >= 500, dict(HITS)
    assert np.any(dtwl > 0.05), "no warm layer ever built in 30 days"


def _fp32_vs_fp64_month(algo):
    npts = 6
    f, isecday, lon = _month_forcing(npts, seed=405)
    cfg = AeroBulkConfig(algo=algo, zt=2.0, zu=10.0, niter=5,
                         use_skin=True)

    def run(dtype):
        forcing = {k: jnp.asarray(v, dtype) for k, v in f.items()}
        outs, final_state = run_series(
            cfg, forcing, isecday_utc=jnp.asarray(isecday),
            lon=jnp.asarray(lon, dtype),
            skin_state=init_skin_state(cfg, (npts,), dtype))
        return outs, final_state

    o64, s64 = run(jnp.float64)
    o32, s32 = run(jnp.float32)
    return o64, s64, o32, s32


def test_fp32_state_drift_budget_720_steps():
    """fp32 (the TPU speed path) vs fp64 across 720 hourly stateful steps:
    the warm-layer state must track within the documented budget — i.e.
    fp32's 24-bit mantissa carries the O(1e6 J/m^2) accumulators through a
    month of build/reset cycles without runaway drift.  The daily dawn
    reset is the stabilizing mechanism: errors cannot compound past ~24 h.

    Budgets are measured-plus-margin (values recorded in docs/SCALING.md
    "fp32 drift budget"); a regression here means the fp32 path's state
    integration degraded.
    """
    o64, s64, o32, s32 = _fp32_vs_fp64_month("coare3p6")

    # final-state drift
    d_qac = np.max(np.abs(np.asarray(s32.Qnt_ac, np.float64)
                          - np.asarray(s64.Qnt_ac)))
    d_tac = np.max(np.abs(np.asarray(s32.Tau_ac, np.float64)
                          - np.asarray(s64.Tau_ac)))
    d_dtwl = np.max(np.abs(np.asarray(s32.dT_wl, np.float64)
                           - np.asarray(s64.dT_wl)))

    # trajectory drift (worst record anywhere in the month)
    t_dtwl = np.max(np.abs(np.asarray(o32.diag.dT_wl, np.float64)
                           - np.asarray(o64.diag.dT_wl)))
    t_ql = np.max(np.abs(np.asarray(o32.QL, np.float64)
                         - np.asarray(o64.QL)))
    t_qh = np.max(np.abs(np.asarray(o32.QH, np.float64)
                         - np.asarray(o64.QH)))

    print(f"\nfp32 drift over {NT} steps: Qnt_ac {d_qac:.3g} J/m^2, "
          f"Tau_ac {d_tac:.3g} N.s/m^2, dT_wl(final) {d_dtwl:.3g} K, "
          f"dT_wl(traj) {t_dtwl:.3g} K, QL(traj) {t_ql:.3g} W/m^2, "
          f"QH(traj) {t_qh:.3g} W/m^2")

    # measured 2026-08 (seed 405, CPU): Qnt_ac 36.2 J/m^2, Tau_ac 1.1e-3,
    # dT_wl(final) 3.1e-8 K, dT_wl(traj) 1.3e-6 K, QL/QH(traj) < 2.5e-3
    # W/m^2 — i.e. NO regime-boundary flips occurred and roundoff stayed
    # dawn-reset-bounded.  Budgets are ~100x measured: a failure here
    # means either real degradation of the fp32 state integration or a
    # platform change flipping a physical branch (both worth surfacing).
    assert d_qac < 4e3, d_qac          # <0.1% of the O(5e6) accumulator
    assert d_tac < 0.1, d_tac
    assert d_dtwl < 1e-5, d_dtwl
    assert t_dtwl < 1e-4, t_dtwl
    assert t_ql < 0.5, t_ql
    assert t_qh < 0.5, t_qh


NT_YEAR = 8760     # a full year of hourly records


@pytest.mark.slow
def test_fp32_state_drift_budget_year():
    """fp32 vs fp64 across a FULL YEAR of hourly stateful steps (8760 —
    the reference's flagship PAPA series length,
    test_aerobulk_buoy_series_oce.f90:364-537), with a seasonal SST and
    solar cycle on top of the month test's weather machine (VERDICT r4
    weak #5: the drift budget previously stopped at 30 days while the
    accumulators integrate O(1e6 J/m^2)).

    What must hold for the fp32 speed path to be safe at year scale:

    * drift must NOT compound — the daily dawn reset bounds error growth
      at ~24 h, so the worst drift in the LAST quarter of the year should
      sit in the same decade as the first quarter, not orders above it;
    * occasional regime-boundary flips (a dawn-window or Qabs<=0 branch
      falling the other way under fp32 rounding) are transient by the
      same mechanism — their per-record frequency is pinned here, and
      each affected point re-synchronizes at the next dawn;
    * the final accumulator state must stay within the month test's
      relative budget (no secular accumulation).
    """
    npts = 4
    f, isecday, lon = _weather_forcing(NT_YEAR, npts, seed=406,
                                       seasonal=True)
    cfg = AeroBulkConfig(algo="coare3p6", zt=2.0, zu=10.0, niter=5,
                         use_skin=True)

    def run(dtype):
        forcing = {k: jnp.asarray(v, dtype) for k, v in f.items()}
        return run_series(cfg, forcing, isecday_utc=jnp.asarray(isecday),
                          lon=jnp.asarray(lon, dtype),
                          skin_state=init_skin_state(cfg, (npts,), dtype))

    o64, s64 = run(jnp.float64)
    o32, s32 = run(jnp.float32)

    d_dtwl = np.abs(np.asarray(o32.diag.dT_wl, np.float64)
                    - np.asarray(o64.diag.dT_wl))
    d_ql = np.abs(np.asarray(o32.QL, np.float64) - np.asarray(o64.QL))
    d_qh = np.abs(np.asarray(o32.QH, np.float64) - np.asarray(o64.QH))
    d_qac = np.max(np.abs(np.asarray(s32.Qnt_ac, np.float64)
                          - np.asarray(s64.Qnt_ac)))

    # growth shape: worst dT_wl drift per quarter of the year
    q_dtwl = d_dtwl[:NT_YEAR].reshape(4, NT_YEAR // 4, npts).max(axis=(1, 2))
    # regime-boundary flip frequency: records where the fp32 flux left
    # the roundoff class entirely (>0.5 W/m^2 is ~100x the roundoff
    # drift, unambiguously a branch flip)
    flip_frac = float(np.mean(np.maximum(d_ql, d_qh) > 0.5))
    med_ql = float(np.median(d_ql))

    print(f"\nfp32 drift over {NT_YEAR} steps: Qnt_ac(final) {d_qac:.3g} "
          f"J/m^2, dT_wl quarterly max {np.array2string(q_dtwl, precision=2)} K, "
          f"QL median {med_ql:.3g} W/m^2, flip fraction {flip_frac:.2e}")

    # measured 2026-08-21 (seed 406, CPU): Qnt_ac(final) 7.65 J/m^2,
    # quarterly dT_wl maxima [1.17e-5, 2.93e-6, 3.57e-6, 3.70e-6] K —
    # FLAT across the year (dawn-reset-bounded, not super-linear; the
    # largest quarter is the FIRST), QL median 2.6e-4 W/m^2, flip
    # fraction 0 (no regime-boundary flip anywhere in 35,040
    # point-records).  Verdict recorded in docs/SCALING.md: fp32 needs
    # no compensated accumulator at year scale.  Budgets ~40-500x
    # measured; a single platform-induced branch flip would exceed the
    # quarterly budget and is worth surfacing (same philosophy as the
    # month test).
    assert d_qac < 4e3, d_qac              # same relative budget as month
    assert q_dtwl[-1] < 1e-3, q_dtwl       # late-year drift stays roundoff
    # no compounding: the last quarter must not be orders above the first
    assert q_dtwl[-1] < 100 * max(q_dtwl[0], 1e-6), q_dtwl
    assert med_ql < 0.01, med_ql           # bulk of records at roundoff
    assert flip_frac < 5e-3, flip_frac     # flips stay rare events
