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
    """Matches doc/ex_ab.dat through the compatibility entry point."""
    QL, QH, Tx, Ty, E, Ts = aerobulk_model(
        1, 1, "coare3p0", 2.0, 10.0, **_inputs(), Niter=50,
        l_use_skin=True, rad_sw=jnp.zeros(2), rad_lw=jnp.full((2,), 350.0))
    np.testing.assert_allclose(np.asarray(QH), [-15.15451, 17.84016],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(QL), [-81.38467, -50.83000],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(Ts) - 273.15,
                               [21.72197, 21.75757], atol=2e-5)


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
