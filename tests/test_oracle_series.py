"""Stateful time-series parity oracle.

The reference's flagship regression workload is a long series of hourly
stateful steps (test_aerobulk_buoy_series_oce.f90:364-537): the warm
layer accumulates heat/momentum across records, resets at local dawn,
and feeds back into the fluxes.  This test runs that exact shape — a
multi-day hourly series with a realistic diurnal solar cycle and a
wrapping UTC clock — through ``run_series`` (the lax.scan driver) and
through the scalar Fortran-transcription oracle threading the warm-layer
state step by step, and requires the full QL/QH/T_s/dT_wl trajectories
and the final state to agree at rtol 1e-12.

This is the time-axis complement of test_oracle_ocean.py's single-step
oracles: it pins the scan plumbing, the per-record isecday handling, and
the state carry (incl. dawn resets actually firing mid-series).
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

# depth tests: multi-step scalar-oracle scans — deselect with -m 'not slow' (make test-fast)
pytestmark = pytest.mark.slow

NT = 120            # 5 days of hourly records
NPTS = 4


def _series_forcing(seed):
    rng = np.random.default_rng(seed)
    lon = np.array([0.0, 95.0, 182.5, 271.0])       # spread of solar lags
    sst0 = 286.0 + 12.0 * rng.random(NPTS)

    hours = np.arange(NT)
    isecday = ((hours % 24) * 3600 + 1800).astype(int)   # wrapping clock

    f = {}
    # slowly-varying SST + diurnal air temperature + noise
    f["sst"] = (sst0[None, :] + 0.5 * np.sin(hours / 48.0)[:, None]
                + 0.05 * rng.normal(size=(NT, NPTS)))
    f["t_zt"] = (f["sst"] + 1.5 * np.sin(2 * np.pi * hours / 24.0)[:, None]
                 + rng.normal(0.0, 1.0, (NT, NPTS)))
    f["slp"] = 99000.0 + 3000.0 * rng.random((NT, NPTS))
    f["hum_zt"] = np.array(
        [[0.55 * oph.q_sat(f["t_zt"][t, i], f["slp"][t, i])
          for i in range(NPTS)] for t in range(NT)])
    f["U_zu"] = 0.5 + 11.0 * rng.random((NT, NPTS))
    f["V_zu"] = rng.normal(0.0, 3.0, (NT, NPTS))
    # diurnal solar cycle in LOCAL time so every point sees real dawns
    loc_h = (hours[:, None] + lon[None, :] / 15.0) % 24.0
    f["rad_sw"] = 900.0 * np.maximum(0.0,
                                     np.sin(np.pi * (loc_h - 6.0) / 12.0))
    f["rad_lw"] = 280.0 + 120.0 * rng.random((NT, NPTS))
    return f, isecday, lon


@pytest.mark.parametrize("version,niter,seed", [
    ("coare3p6", 5, 301),
    ("coare3p0", 6, 302),
])
def test_oracle_series_coare_skin(version, niter, seed):
    f, isecday, lon = _series_forcing(seed)

    cfg = AeroBulkConfig(algo=version, zt=2.0, zu=10.0, niter=niter,
                         use_skin=True)
    forcing = {k: jnp.asarray(v) for k, v in f.items()}
    outs, final_state = run_series(
        cfg, forcing, isecday_utc=jnp.asarray(isecday),
        lon=jnp.asarray(lon),
        skin_state=init_skin_state(cfg, (NPTS,), jnp.float64))

    # ---- scalar chain: thread the warm-layer state record by record ----
    reset_hits()
    ql = np.zeros((NT, NPTS))
    qh = np.zeros((NT, NPTS))
    ts = np.zeros((NT, NPTS))
    dtwl = np.zeros((NT, NPTS))
    states = [(0.0, 20.0, 0.0, 0.0)] * NPTS
    for t in range(NT):
        for i in range(NPTS):
            q = f["hum_zt"][t, i]
            wnd = math.sqrt(f["U_zu"][t, i] ** 2 + f["V_zu"][t, i] ** 2)
            ssq = c.rdct_qsat_salt * oph.q_sat(f["sst"][t, i],
                                               f["slp"][t, i])
            theta = oph.theta_from_z_p0_t_q(2.0, f["slp"][t, i],
                                            f["t_zt"][t, i], q)
            out, states[i] = otb.turb_coare_sc(
                version, 2.0, 10.0, f["sst"][t, i], theta, ssq, q, wnd,
                niter=niter, use_cs=True, use_wl=True,
                Qsw=(1.0 - c.roce_alb0) * f["rad_sw"][t, i],
                rad_lw=f["rad_lw"][t, i], slp=f["slp"][t, i],
                isecday_utc=int(isecday[t]), lon=lon[i],
                wl_state=states[i])
            _, QH, QL, _, _ = oph.bulk_formula(
                10.0, out["T_s"], out["q_s"], out["t_zu"], out["q_zu"],
                out["Cd"], out["Ch"], out["Ce"], wnd, out["Ubzu"],
                f["slp"][t, i])
            ql[t, i] = QL
            qh[t, i] = QH
            ts[t, i] = out["T_s"]
            dtwl[t, i] = out["dT_wl"]

    np.testing.assert_allclose(np.asarray(outs.QL), ql, rtol=1e-12,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(outs.QH), qh, rtol=1e-12,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(outs.T_s), ts, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(outs.diag.dT_wl), dtwl,
                               rtol=1e-12, atol=1e-13)

    exp_state = np.array(states)
    np.testing.assert_allclose(np.asarray(final_state.dT_wl),
                               exp_state[:, 0], rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(final_state.Hz_wl),
                               exp_state[:, 1], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(final_state.Qnt_ac),
                               exp_state[:, 2], rtol=1e-12, atol=1e-8)
    np.testing.assert_allclose(np.asarray(final_state.Tau_ac),
                               exp_state[:, 3], rtol=1e-12, atol=1e-10)

    # the series must have actually exercised the stateful machinery:
    # warm layers built up, drained, and were dawn-reset along the way
    for key in ("wl_dawn_reset", "wl_built", "wl_commit"):
        assert HITS[key] > 0, (key, dict(HITS))
    assert np.any(dtwl > 0.05), "no warm layer ever built in 5 days"


def test_oracle_series_ecmwf_skin():
    """Same shape for the ECMWF prognostic warm layer (commits every
    iteration, fixed 3 m depth)."""
    f, isecday, lon = _series_forcing(303)

    cfg = AeroBulkConfig(algo="ecmwf", zt=2.0, zu=10.0, niter=5,
                         use_skin=True)
    forcing = {k: jnp.asarray(v) for k, v in f.items()}
    outs, final_state = run_series(
        cfg, forcing, isecday_utc=jnp.asarray(isecday),
        lon=jnp.asarray(lon),
        skin_state=init_skin_state(cfg, (NPTS,), jnp.float64))

    ql = np.zeros((NT, NPTS))
    dtwl = np.zeros((NT, NPTS))
    states = [(0.0, 3.0)] * NPTS
    for t in range(NT):
        for i in range(NPTS):
            q = f["hum_zt"][t, i]
            wnd = math.sqrt(f["U_zu"][t, i] ** 2 + f["V_zu"][t, i] ** 2)
            ssq = c.rdct_qsat_salt * oph.q_sat(f["sst"][t, i],
                                               f["slp"][t, i])
            theta = oph.theta_from_z_p0_t_q(2.0, f["slp"][t, i],
                                            f["t_zt"][t, i], q)
            out, states[i] = otb.turb_ecmwf_sc(
                2.0, 10.0, f["sst"][t, i], theta, ssq, q, wnd, niter=5,
                use_cs=True, use_wl=True,
                Qsw=(1.0 - c.roce_alb0) * f["rad_sw"][t, i],
                rad_lw=f["rad_lw"][t, i], slp=f["slp"][t, i],
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
    np.testing.assert_allclose(np.asarray(final_state.dT_wl),
                               np.array(states)[:, 0], rtol=1e-12,
                               atol=1e-13)
    assert np.any(dtwl > 0.05)
