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
