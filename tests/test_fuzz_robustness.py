"""Robustness fuzz over the reference's own validity ranges.

AEROBULK_INIT accepts SST in [270, 320] K, air temp [180, 330] K, wind
[0, 50] m/s, slp [80, 110] kPa (mod_const.f90:138-149).  Every FPE guard
of the reference (zeta caps, wind floors, Cx_min, z0 clamps) exists to
keep this envelope finite — so the rebuilt clamps must too, including the
corners (zero wind, extreme stability, saturation).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aerobulk_tpu import constants as c
from aerobulk_tpu import thermo
from aerobulk_tpu.api import AeroBulkConfig, flux_step, flux_step_ice
from aerobulk_tpu.ice import ICE_ALGOS

# depth tests: full-range fuzz sweeps — deselect with -m 'not slow' (make test-fast)
pytestmark = pytest.mark.slow


def _fuzz_inputs(n=20000, seed=77):
    rng = np.random.default_rng(seed)
    sst = rng.uniform(c.ref_sst_min, c.ref_sst_max, n)
    # air temp within +-25 K of SST (beyond that the physics is nonsense
    # for *ocean* surface layers, and the reference aborts on unit checks
    # long before); still spans strongly stable & unstable regimes
    t = np.clip(sst + rng.uniform(-25.0, 25.0, n),
                c.ref_taa_min, c.ref_taa_max)
    slp = rng.uniform(c.ref_slp_min, c.ref_slp_max, n)
    # humidity: 0..100% of saturation at air temperature
    qs = np.asarray(thermo.q_sat(jnp.asarray(t), jnp.asarray(slp)))
    q = np.minimum(rng.uniform(0.0, 1.0, n) * qs, c.ref_sha_max - 1e-6)
    wnd = rng.uniform(c.ref_wnd_min, c.ref_wnd_max, n)
    ang = rng.uniform(0, 2 * np.pi, n)
    u, v = wnd * np.cos(ang), wnd * np.sin(ang)
    # force the corners in explicitly
    u[:4] = [0.0, 0.0, 50.0, 0.001]
    v[:4] = [0.0, 0.0, 0.0, 0.0]
    t[1] = sst[1] + 25.0    # extremely stable, no wind
    t[2] = sst[2] - 25.0    # extremely unstable, hurricane wind
    rsw = rng.uniform(c.ref_rsw_min, c.ref_rsw_max, n)
    rlw = rng.uniform(c.ref_rlw_min, c.ref_rlw_max, n)
    lon = rng.uniform(-180.0, 360.0, n)
    J = jnp.asarray
    return (J(sst), J(t), J(q), J(u), J(v), J(slp), J(rsw), J(rlw), J(lon))


@pytest.mark.parametrize("algo", ["coare3p0", "coare3p6", "ecmwf", "ncar",
                                  "andreas"])
def test_ocean_algos_finite_over_validity_envelope(algo):
    sst, t, q, u, v, slp, rsw, rlw, lon = _fuzz_inputs()
    skin = algo in ("coare3p0", "coare3p6", "ecmwf")
    cfg = AeroBulkConfig(algo=algo, niter=10, use_skin=skin)
    kw = dict(rad_sw=rsw, rad_lw=rlw, isecday_utc=50000, lon=lon) \
        if skin else {}
    out, st = flux_step(cfg, sst, t, q, u, v, slp, **kw)
    for name in ("QL", "QH", "Tau", "Tau_x", "Tau_y", "Evap", "T_s"):
        x = np.asarray(getattr(out, name))
        bad = ~np.isfinite(x)
        assert not bad.any(), (
            f"{algo}.{name}: {bad.sum()} non-finite "
            f"e.g. idx {np.nonzero(bad)[0][:5]}")
    d = out.diag
    for name in ("Cd", "Ch", "Ce", "z0", "u_star", "UN10"):
        x = np.asarray(getattr(d, name))
        assert np.all(np.isfinite(x)), f"{algo}.diag.{name}"
    assert np.all(np.asarray(d.Cd) >= c.Cx_min * 0.999)
    assert np.all(np.asarray(st.dT_wl) >= 0.0) or not skin
    # the reference *aborts* when tau > 10 N/m^2 (BULK_FORMULA_VCTR,
    # mod_phymbl.f90:1249-1253) — physically that only happens at extreme
    # hurricane winds; below 25 m/s the envelope must stay under the limit
    wnd = np.hypot(np.asarray(u), np.asarray(v))
    tau = np.asarray(out.Tau)
    assert tau[wnd < 25.0].max() < c.ref_tau_max


@pytest.mark.parametrize("algo", sorted(ICE_ALGOS))
def test_ice_algos_finite_over_validity_envelope(algo):
    rng = np.random.default_rng(13)
    n = 8000
    Ts_i = rng.uniform(230.0, 273.15, n)
    t = np.clip(Ts_i + rng.uniform(-20.0, 20.0, n), 180.0, 330.0)
    slp = rng.uniform(c.ref_slp_min, c.ref_slp_max, n)
    qs = np.asarray(thermo.q_sat(jnp.asarray(t), jnp.asarray(slp),
                                 l_ice=True))
    q = rng.uniform(0.0, 1.0, n) * qs
    wnd = rng.uniform(0.0, 50.0, n)
    wnd[:2] = [0.0, 50.0]
    fr = rng.uniform(0.0, 1.0, n)
    fr[:2] = [0.0, 1.0]
    J = jnp.asarray
    out, d = flux_step_ice(algo, 2.0, 10.0, J(Ts_i), J(t), J(q), J(wnd),
                           J(np.zeros(n)), J(slp), frice=J(fr), niter=8)
    for name in ("QL", "QH", "Tau"):
        assert np.all(np.isfinite(np.asarray(getattr(out, name)))), \
            f"{algo}.{name}"
    for name in ("Cd", "Ch", "Ce"):
        assert np.all(np.isfinite(np.asarray(getattr(d, name)))), \
            f"{algo}.{name}"
