"""Tests for the reference-compatible aerobulk_model entry point."""

import jax.numpy as jnp
import numpy as np
import pytest

from aerobulk_tpu import aerobulk_model


def _inputs():
    return dict(
        sst=jnp.array([295.15, 295.15]),
        t_zt=jnp.array([293.15, 298.15]),
        hum_zt=jnp.array([0.012, 0.012]),
        U_zu=jnp.array([5.0, 5.0]),
        V_zu=jnp.array([0.0, 0.0]),
        slp=jnp.array([101000.0, 101000.0]))


def test_aerobulk_model_golden():
    """Matches the reference example through the compatibility entry point.
    Values are the current-reference-semantics COARE3.0 outputs (visc_air
    at t_zt, mod_blk_coare3p0.f90:237); doc/ex_ab.dat predates that change
    (see tests/test_golden_ocean.py staleness note)."""
    QL, QH, Tx, Ty, E, Ts = aerobulk_model(
        1, 1, "coare3p0", 2.0, 10.0, **_inputs(), Niter=50,
        l_use_skin=True, rad_sw=jnp.zeros(2), rad_lw=jnp.full((2,), 350.0))
    np.testing.assert_allclose(np.asarray(QH), [-15.155299, 17.835405],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(QL), [-81.389019, -50.815788],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(Ts) - 273.15,
                               [21.721964, 21.757541], atol=2e-5)


def test_aerobulk_model_state_lifecycle():
    """jt=1..Nt carries warm-layer state; a fresh jt=1 resets it."""
    kw = dict(Niter=10, l_use_skin=True,
              rad_sw=jnp.full((2,), 700.0), rad_lw=jnp.full((2,), 420.0),
              isecday_utc=12 * 3600)
    inputs = _inputs()
    _, _, _, _, _, ts1 = aerobulk_model(1, 2, "coare3p6", 2.0, 10.0,
                                        **inputs, **kw)
    _, _, _, _, _, ts2 = aerobulk_model(2, 2, "coare3p6", 2.0, 10.0,
                                        **inputs, **kw)
    _, _, _, _, _, ts1b = aerobulk_model(1, 1, "coare3p6", 2.0, 10.0,
                                         **inputs, **kw)
    np.testing.assert_allclose(np.asarray(ts1), np.asarray(ts1b))
    assert float(ts2[0]) > float(ts1[0])   # warm layer accumulated


def test_aerobulk_model_detects_humidity():
    """Relative humidity is auto-detected like AEROBULK_INIT does."""
    inputs = _inputs()
    inputs["hum_zt"] = jnp.array([75.0, 75.0])   # [%]
    QL, QH, *_ = aerobulk_model(1, 1, "ncar", 2.0, 10.0, **inputs, Niter=10)
    assert np.all(np.isfinite(np.asarray(QL)))

    # nonsense humidity range aborts
    inputs["hum_zt"] = jnp.array([1.0e5, 1.0e5])
    with pytest.raises(ValueError):
        aerobulk_model(1, 1, "ncar", 2.0, 10.0, **inputs, Niter=10)


def test_aerobulk_model_humidity_detected_once():
    """The humidity kind is detected at jt==1 and CARRIED, like the
    reference stores ctype_humidity at init (mod_aerobulk.f90:127) — a
    series whose humidity values drift across a range boundary must keep
    one interpretation, not flip mid-run."""
    from aerobulk_tpu.api import AeroBulkConfig, flux_step

    inputs = _inputs()
    inputs["hum_zt"] = jnp.array([75.0, 80.0])       # detected as RH [%]
    aerobulk_model(1, 3, "ncar", 2.0, 10.0, **inputs, Niter=10)

    # record 2 drifts into the specific-humidity value range; a per-step
    # re-detection would silently flip the interpretation to 'sh'
    inputs["hum_zt"] = jnp.array([0.05, 0.06])
    QL2, *_ = aerobulk_model(2, 3, "ncar", 2.0, 10.0, **inputs, Niter=10)

    cfg_rh = AeroBulkConfig(algo="ncar", zt=2.0, zu=10.0, niter=10,
                            humidity="rh")
    out_rh, _ = flux_step(cfg_rh, inputs["sst"], inputs["t_zt"],
                          inputs["hum_zt"], inputs["U_zu"], inputs["V_zu"],
                          inputs["slp"])
    np.testing.assert_allclose(np.asarray(QL2), np.asarray(out_rh.QL),
                               rtol=1e-12)
    # close the series so the registry entry is dropped
    aerobulk_model(3, 3, "ncar", 2.0, 10.0, **inputs, Niter=10)


def test_aerobulk_model_series_id_isolates_state():
    """Two interleaved warm-layer series with the same algo+shape must not
    share state when distinguished by series_id."""
    kw = dict(Niter=10, l_use_skin=True,
              rad_sw=jnp.full((2,), 700.0), rad_lw=jnp.full((2,), 420.0),
              isecday_utc=12 * 3600)
    inputs = _inputs()
    # series A: two steps; series B: one step interleaved between them
    _, _, _, _, _, a1 = aerobulk_model(1, 3, "coare3p6", 2.0, 10.0,
                                       **inputs, **kw, series_id="A")
    _, _, _, _, _, b1 = aerobulk_model(1, 3, "coare3p6", 2.0, 10.0,
                                       **inputs, **kw, series_id="B")
    _, _, _, _, _, a2 = aerobulk_model(2, 3, "coare3p6", 2.0, 10.0,
                                       **inputs, **kw, series_id="A")
    # B's first step must equal A's first step (fresh state), and A's
    # second step reflects exactly one prior accumulation
    np.testing.assert_allclose(np.asarray(b1), np.asarray(a1))
    assert float(a2[0]) > float(a1[0])
    # cleanup
    aerobulk_model(3, 3, "coare3p6", 2.0, 10.0, **inputs, **kw,
                   series_id="A")
    aerobulk_model(3, 3, "coare3p6", 2.0, 10.0, **inputs, **kw,
                   series_id="B")
