"""Branch-free masked math vs literal control flow.

The TPU implementation rewrites every data-dependent branch of the
reference as masked arithmetic (warm-layer early-exit cascade, LKB lookup
loop, skin-layer regimes).  These tests implement the *control-flow*
semantics directly in scalar Python (following mod_skin_coare.f90 /
mod_phymbl.f90 branch by branch) and verify the vectorized branch-free
versions agree over randomized inputs that hit every branch.
"""

import math

import jax.numpy as jnp
import numpy as np

from aerobulk_tpu import constants as c
from aerobulk_tpu.skin import (HWL_MAX, RICH0, SkinState, wl_coare)
from aerobulk_tpu.thermo import z0tq_lkb


# --- scalar WL_COARE with literal control flow (mod_skin_coare.f90:97-250)

def _absorb(hwl):
    return 1.0 - (0.28 * 0.014 * (1 - math.exp(-hwl / 0.014))
                  + 0.27 * 0.357 * (1 - math.exp(-hwl / 0.357))
                  + 0.45 * 12.82 * (1 - math.exp(-hwl / 12.82))) / hwl


def wl_coare_scalar(Qsw, Qnsol, Tau, sst, lon, isd, dT_wl, Hz_wl, Qnt_ac,
                    Tau_ac, rdt=3600.0, gdept=1.0):
    l_exit = False
    l_destroy = False

    zdT = dT_wl
    zH = max(min(Hz_wl, HWL_MAX), 0.1)
    zqac = Qnt_ac
    ztac = Tau_ac

    rlag = -(((360.0 - lon % 360.0) / 15.0) % 24.0)
    rlag = -math.copysign(min(abs(rlag), abs(rlag % 24.0)), rlag + 12.0)
    ilag = int(rlag * 3600.0)
    isd_sol = (isd + ilag) % 86400
    rhr = isd_sol / 3600.0

    alpha = 2.1e-5 * max(sst - c.rt0 + 3.2, 0.0) ** 0.79
    cd1 = math.sqrt(2.0 * RICH0 * c.rCp0_w / (alpha * c.grav * c.rho0_w))
    cd2 = math.sqrt(2.0 * alpha * c.grav / (RICH0 * c.rho0_w)) / c.rCp0_w ** 1.5

    if 4.0 < rhr <= 6.5:
        l_exit = True
        l_destroy = True

    if not l_exit:
        zfr = _absorb(zH)
        zQabs = zfr * Qsw + Qnsol
        if abs(zdT) < 1e-6 and zQabs <= 0.0:
            l_exit = True

    if (not l_exit) and (Qnt_ac + zQabs * rdt <= 0.0):
        l_exit = True
        l_destroy = True

    if not l_exit:
        ztac = Tau_ac + max(0.002, Tau) * rdt
        for _ in range(5):
            zfr = _absorb(zH)
            zQabs = zfr * Qsw + Qnsol
            zqac = Qnt_ac + zQabs * rdt
            if zqac <= 0.0:
                break
            zH = max(min(HWL_MAX, cd1 * ztac / math.sqrt(zqac)), 0.1)
        if zqac <= 0.0:
            l_destroy = True
            l_exit = True
        else:
            zdT = cd2 * zqac ** 1.5 / ztac * max(zqac / abs(zqac), 0.0)
            flg = 1.0 if gdept - zH >= 0 else 0.0
            zdT = zdT * (flg + (1 - flg) * gdept / zH)

    if l_destroy:
        zdT = 0.0
        zH = HWL_MAX
        zqac = 0.0
        ztac = 0.0
    return zdT, zH, zqac, ztac


def test_wl_coare_branchfree_equivalence():
    rng = np.random.default_rng(123)
    n = 4000
    Qsw = np.where(rng.random(n) < 0.3, 0.0, 900.0 * rng.random(n))
    Qnsol = -250.0 + 300.0 * rng.random(n)
    Tau = 0.3 * rng.random(n)
    sst = 272.0 + 30.0 * rng.random(n)
    lon = 360.0 * rng.random(n) - 90.0
    isd = int(rng.integers(0, 86400))
    dT0 = np.where(rng.random(n) < 0.4, 0.0, 2.0 * rng.random(n))
    Hz0 = 0.05 + 25.0 * rng.random(n)
    qac0 = np.where(rng.random(n) < 0.3, 0.0, 3.0e6 * rng.random(n))
    tac0 = np.where(qac0 == 0.0, 0.0, 500.0 * rng.random(n))

    st = SkinState(dT_wl=jnp.asarray(dT0), Hz_wl=jnp.asarray(Hz0),
                   Qnt_ac=jnp.asarray(qac0), Tau_ac=jnp.asarray(tac0))
    new = wl_coare(jnp.asarray(Qsw), jnp.asarray(Qnsol), jnp.asarray(Tau),
                   jnp.asarray(sst), jnp.asarray(lon), isd, st)

    exp = np.array([wl_coare_scalar(Qsw[i], Qnsol[i], Tau[i], sst[i],
                                    lon[i], isd, dT0[i], Hz0[i], qac0[i],
                                    tac0[i]) for i in range(n)])
    np.testing.assert_allclose(np.asarray(new.dT_wl), exp[:, 0], rtol=1e-12,
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(new.Hz_wl), exp[:, 1], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(new.Qnt_ac), exp[:, 2], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(new.Tau_ac), exp[:, 3], rtol=1e-12)


# --- scalar LKB lookup with the literal DO WHILE (mod_phymbl.f90:1683-1699)

_XA = [[0.177, 1.376, 1.026, 1.625, 4.661, 34.904, 1667.19, 5.88e5],
       [0.292, 1.808, 1.393, 1.956, 4.994, 30.709, 1448.68, 2.98e5]]
_XB = [[0.0, 0.929, -0.599, -1.018, -1.475, -2.067, -2.907, -3.935],
       [0.0, 0.826, -0.528, -0.870, -1.297, -1.845, -2.682, -3.616]]
_XRAN = [0.0, 0.11, 0.825, 3.0, 10.0, 30.0, 100.0, 300.0, 1000.0]


def z0tq_lkb_scalar(iflag, rer, z0):
    val = -999.0
    if 0.0 < rer < 1000.0:
        jm = 0
        found = False
        while not found:
            jm += 1
            found = _XRAN[jm - 1] < rer <= _XRAN[jm]
        val = _XA[iflag - 1][jm - 1] * rer ** _XB[iflag - 1][jm - 1] * z0 / rer
    return min(max(abs(val), 1e-9), 0.05)


def test_z0tq_lkb_branchfree_equivalence():
    rng = np.random.default_rng(7)
    rer = np.concatenate([
        10.0 ** rng.uniform(-3, 3.2, 2000),
        np.asarray([0.0, 0.11, 0.825, 3.0, 10.0, 30.0, 100.0, 300.0,
                    999.9999, 1000.0, 1500.0, 1e-9]),
    ])
    z0 = 10.0 ** rng.uniform(-6, -2, rer.shape[0])
    for iflag in (1, 2):
        got = np.asarray(z0tq_lkb(iflag, jnp.asarray(rer), jnp.asarray(z0)))
        exp = np.array([z0tq_lkb_scalar(iflag, rer[i], z0[i])
                        for i in range(len(rer))])
        np.testing.assert_allclose(got, exp, rtol=1e-12)
