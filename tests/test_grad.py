"""Differentiability tests.

A capability the Fortran reference cannot offer: the whole flux pipeline
is differentiable, so flux sensitivities (dQ/dSST etc. — the quantities
GCM adjoints and data-assimilation systems need) come from ``jax.grad``.
Verified against finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aerobulk_tpu.api import AeroBulkConfig, flux_step


@pytest.mark.parametrize("algo", ["coare3p6", "ncar", "ecmwf"])
def test_flux_gradient_matches_finite_difference(algo):
    cfg = AeroBulkConfig(algo=algo, niter=5,
                         use_skin=(algo != "ncar"))

    def ql_of_sst(sst_scalar):
        sst = jnp.full((1,), sst_scalar)
        kw = {}
        if cfg.use_skin:
            kw = dict(rad_sw=jnp.full((1,), 200.0),
                      rad_lw=jnp.full((1,), 380.0), isecday_utc=43200)
        out, _ = flux_step(cfg, sst, jnp.full((1,), 293.15),
                           jnp.full((1,), 0.012), jnp.full((1,), 6.0),
                           jnp.zeros((1,)), jnp.full((1,), 101000.0), **kw)
        return out.QL[0]

    g = jax.grad(ql_of_sst)(295.15)
    eps = 1e-4
    fd = (ql_of_sst(295.15 + eps) - ql_of_sst(295.15 - eps)) / (2 * eps)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-4)
    # more evaporation from a warmer ocean: dQL/dSST < 0 (QL is negative
    # and grows in magnitude)
    assert float(g) < 0.0


def test_series_gradient_through_scan():
    """Gradients flow through the warm-layer state across time steps."""
    from aerobulk_tpu.api import run_series
    cfg = AeroBulkConfig(algo="coare3p6", niter=2, use_skin=True)
    nt, npts = 3, 2

    def total_ql(sst0):
        forcing = dict(
            sst=jnp.full((nt, npts), sst0),
            t_zt=jnp.full((nt, npts), 298.15),
            hum_zt=jnp.full((nt, npts), 0.015),
            U_zu=jnp.full((nt, npts), 4.0),
            V_zu=jnp.zeros((nt, npts)),
            slp=jnp.full((nt, npts), 101000.0),
            rad_sw=jnp.full((nt, npts), 600.0),
            rad_lw=jnp.full((nt, npts), 400.0))
        outs, _ = run_series(cfg, forcing,
                             isecday_utc=jnp.arange(10, 10 + nt) * 3600)
        return jnp.sum(outs.QL)

    g = jax.jit(jax.grad(total_ql))(300.15)
    assert np.isfinite(float(g)) and float(g) != 0.0


STABLE, UNSTABLE = +2.0, -3.0


@pytest.mark.parametrize("algo", ["coare3p0", "coare3p6", "ncar", "ecmwf",
                                  "andreas"])
@pytest.mark.parametrize("dt_air", [STABLE, UNSTABLE])
def test_gradient_finite_both_stability_regimes(algo, dt_air):
    """jax.grad is finite on BOTH sides of neutral for every ocean algo.

    Regression guard for the ``MAX(x,0)**(2/3)`` gustiness clamp whose
    naive form had a NaN gradient at every stably-stratified point
    (thermo.pow23_pos) — i.e. over roughly half the ocean."""
    cfg = AeroBulkConfig(algo=algo, niter=5)

    def total_flux(sst_scalar):
        sst = jnp.full((3,), sst_scalar)
        out, _ = flux_step(cfg, sst, sst + dt_air,
                           jnp.full((3,), 0.010), jnp.full((3,), 7.0),
                           jnp.full((3,), 1.0), jnp.full((3,), 101000.0))
        return jnp.sum(out.QL + out.QH + out.Tau_x)

    g = float(jax.grad(total_flux)(290.0))
    assert np.isfinite(g) and g != 0.0


def test_charnock_calibration_recovers_coefficients():
    """End-to-end gradient calibration THROUGH the bulk solve: recover the
    COARE 3.6 Charnock law's (slope, offset) from synthetic flux
    observations (examples/calibrate_charnock.py, abridged)."""
    import importlib.util
    import pathlib
    path = pathlib.Path(__file__).parent.parent / "examples" / \
        "calibrate_charnock.py"
    spec = importlib.util.spec_from_file_location("calibrate_charnock", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    obs = mod.make_campaign(n=256, seed=1)
    target = mod.fluxes(obs)
    slope, offset = mod.calibrate(obs, target, steps=250, verbose=False)
    assert abs(slope - mod.TRUE_SLOPE) < 0.05 * mod.TRUE_SLOPE
    assert abs(offset - mod.TRUE_OFFSET) < 1.0e-3
