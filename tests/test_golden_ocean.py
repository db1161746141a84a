"""Golden-value regression tests for the 5 ocean algorithms.

Anchors (BASELINE.md):
  * doc/ex_ab.dat — 2-point (unstable + stable) example with skin schemes,
    nb_iter=50, fp64; values matched at rtol=1e-5.
  * README.md toy table — single unstable point, no skin, nb_iter=20;
    values printed rounded to ~5 digits, matched at rtol=2e-3 (some README
    numbers predate minor reference tweaks).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aerobulk_tpu.algos import OCEAN_ALGOS
from aerobulk_tpu.api import AeroBulkConfig, flux_step

# --- shared 2-point forcing (example_call_aerobulk.f90:29-44) -------------
SST = np.array([295.15, 295.15])
T_ZT = np.array([293.15, 298.15])     # unstable / stable
Q_ZT = np.array([0.012, 0.012])
U = np.array([5.0, 5.0])
V = np.array([0.0, 0.0])
SLP = np.array([101000.0, 101000.0])
RSW = np.array([0.0, 0.0])            # night
RLW = np.array([350.0, 350.0])

# doc/ex_ab.dat golden outputs (QH, QL, Evap mm/day, T_skin degC, Tau_x)
#
# COARE3.0 staleness note: doc/ex_ab.dat's coare3p0 block (QH=-15.15451,
# QL=-81.38467, ...) reproduces only with visc_air evaluated at the
# first-guess t_zu — the *current* reference code evaluates it at t_zt
# (mod_blk_coare3p0.f90:237), which yields QH=-15.155299 etc. (verified
# both ways with the scalar oracle, tests/oracle/turb.py).  The golden
# file predates that change; we match the current code, and the values
# below for coare3p0 are the oracle's current-semantics outputs.
EX_AB = {
    "coare3p0": dict(QH=(-15.155299, 17.835405), QL=(-81.389019, -50.815788),
                     E=(-2.8707723, -1.7924480), Ts=(21.721964, 21.757541),
                     Tx=(3.57847383e-2, 1.73378050e-2), skin=True),
    "coare3p6": dict(QH=(-15.38655, 17.08068), QL=(-83.07884, -48.43779),
                     E=(-2.930330, -1.708553), Ts=(21.70580, 21.74849),
                     Tx=(3.2181785e-2, 1.5142991e-2), skin=True),
    "ecmwf": dict(QH=(-14.38223, 17.65283), QL=(-80.29590, -52.46112),
                  E=(-2.832244, -1.850494), Ts=(21.73254, 21.76303),
                  Tx=(3.8438912e-2, 1.9324517e-2), skin=True),
    "ncar": dict(QH=(-16.69695, 10.72617), QL=(-88.47819, -71.90122),
                 E=(-3.121663, -2.536799), Ts=None,
                 Tx=(3.5851959e-2, 2.7732996e-2), skin=False),
    "andreas": dict(QH=(-14.41300, 15.19631), QL=(-74.46378, -51.69934),
                    E=(-2.627210, -1.824042), Ts=None,
                    Tx=(3.0277077e-2, 1.7942309e-2), skin=False),
}


@pytest.mark.parametrize("algo", sorted(EX_AB))
def test_ex_ab_golden(algo):
    exp = EX_AB[algo]
    cfg = AeroBulkConfig(algo=algo, zt=2.0, zu=10.0, niter=50,
                         use_skin=exp["skin"])
    out, _ = flux_step(cfg, jnp.asarray(SST), jnp.asarray(T_ZT),
                       jnp.asarray(Q_ZT), jnp.asarray(U), jnp.asarray(V),
                       jnp.asarray(SLP), rad_sw=jnp.asarray(RSW),
                       # ex_ab.dat was generated with the reference's
                       # hardcoded library clock (mod_aerobulk_compute:136)
                       rad_lw=jnp.asarray(RLW), isecday_utc=12)
    np.testing.assert_allclose(out.QH, exp["QH"], rtol=1e-5)
    np.testing.assert_allclose(out.QL, exp["QL"], rtol=1e-5)
    np.testing.assert_allclose(out.Evap * 86400.0, exp["E"], rtol=1e-5)
    np.testing.assert_allclose(out.Tau_x, exp["Tx"], rtol=1e-5)
    np.testing.assert_allclose(out.Tau_y, 0.0, atol=1e-12)
    if exp["Ts"] is not None:
        np.testing.assert_allclose(out.T_s - 273.15, exp["Ts"], atol=2e-5)


# README.md:188-211 toy table (no skin, nb_iter=20, slp=1010 hPa):
# columns coare3p0 / coare3p6 / ncar / ecmwf / andreas
TOY = {
    "coare3p0": dict(Cd=1.1954e-3, Ce=1.3345e-3, Ch=1.3345e-3,
                     z0=4.40936e-5, us=0.17578, UN10=5.4192,
                     CdN=1.0521e-3, CeN=1.1077e-3, ChN=1.1077e-3),
    "coare3p6": dict(Cd=1.0775e-3, Ce=1.3729e-3, Ch=1.3729e-3,
                     z0=2.19285e-5, us=0.16672, UN10=5.4311,
                     CdN=0.94234e-3, CeN=1.1119e-3, ChN=1.1119e-3),
    "ncar": dict(Cd=1.2038e-3, Ce=1.3618e-3, Ch=1.2776e-3,
                 z0=4.49880e-5, us=0.17348, UN10=5.3396,
                 CdN=1.0555e-3, CeN=1.1241e-3, ChN=1.0624e-3),
    # NB: README prints CeN=1.1064e-3 for ecmwf, but the current reference
    # code computes CeN with z0t (mod_blk_ecmwf.f90:364-366), i.e. == ChN;
    # the README predates that change.  We match the code, not the README.
    "ecmwf": dict(Cd=1.2862e-3, Ce=1.3143e-3, Ch=1.2635e-3,
                  z0=6.98835e-5, us=0.18192, UN10=5.3992,
                  CdN=1.1353e-3, CeN=1.0680e-3, ChN=1.0680e-3),
    "andreas": dict(Cd=1.0167e-3, Ce=1.1565e-3, Ch=1.1103e-3,
                    z0=1.56119e-5, us=0.1594, UN10=5.3289,
                    CdN=0.8950e-3, CeN=0.9600e-3, ChN=0.9260e-3),
}


@pytest.mark.parametrize("algo", sorted(TOY))
def test_readme_toy_table(algo):
    exp = TOY[algo]
    cfg = AeroBulkConfig(algo=algo, zt=2.0, zu=10.0, niter=20)
    out, _ = flux_step(cfg, jnp.asarray(SST[:1]), jnp.asarray(T_ZT[:1]),
                       jnp.asarray(Q_ZT[:1]), jnp.asarray(U[:1]),
                       jnp.asarray(V[:1]), jnp.asarray(SLP[:1]))
    d = out.diag
    np.testing.assert_allclose(d.Cd, exp["Cd"], rtol=2e-3)
    np.testing.assert_allclose(d.Ce, exp["Ce"], rtol=2e-3)
    np.testing.assert_allclose(d.Ch, exp["Ch"], rtol=2e-3)
    np.testing.assert_allclose(d.z0, exp["z0"], rtol=5e-3)
    np.testing.assert_allclose(d.u_star, exp["us"], rtol=2e-3)
    np.testing.assert_allclose(d.UN10, exp["UN10"], rtol=2e-3)
    np.testing.assert_allclose(d.CdN, exp["CdN"], rtol=2e-3)
    np.testing.assert_allclose(d.CeN, exp["CeN"], rtol=2e-3)
    np.testing.assert_allclose(d.ChN, exp["ChN"], rtol=2e-3)


@pytest.mark.parametrize("algo", sorted(OCEAN_ALGOS))
@pytest.mark.slow
def test_jit_and_grid_consistency(algo):
    """jit(flux_step) over a 2-D grid == per-point results (pointwise op)."""
    import jax
    cfg = AeroBulkConfig(algo=algo, zt=2.0, zu=10.0, niter=5)
    rng = np.random.default_rng(0)
    shape = (4, 6)
    sst = 290.0 + 8.0 * rng.random(shape)
    t = sst + rng.normal(0, 2.0, shape)
    q = 0.005 + 0.01 * rng.random(shape)
    u = 0.2 + 12.0 * rng.random(shape)
    v = rng.normal(0, 3.0, shape)
    slp = 98000.0 + 4000.0 * rng.random(shape)

    step = jax.jit(lambda *a: flux_step(cfg, *a)[0])
    full = step(*map(jnp.asarray, (sst, t, q, u, v, slp)))
    half = step(*(jnp.asarray(x[:2]) for x in (sst, t, q, u, v, slp)))
    np.testing.assert_allclose(full.QL[:2], half.QL, rtol=1e-12)
    np.testing.assert_allclose(full.Tau[:2], half.Tau, rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(full.QL)))
    assert np.all(np.isfinite(np.asarray(full.QH)))
    assert np.all(np.isfinite(np.asarray(full.Tau)))
