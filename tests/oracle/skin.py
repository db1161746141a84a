"""Scalar transcriptions of the cool-skin / warm-layer schemes.

CS_COARE / WL_COARE from mod_skin_coare.f90, CS_ECMWF / WL_ECMWF from
mod_skin_ecmwf.f90 — literal control flow (the warm-layer early-exit
cascade, the inner EXIT loop, the dawn reset window).
"""

import math

from aerobulk_tpu import constants as c

from . import HITS
from .phymbl import alpha_sw, delta_skin_layer, fsign

HWL_MAX = 20.0     # mod_skin_coare.f90:38
RICH0 = 0.65       # mod_skin_coare.f90:40
RD0_ECMWF = 3.0    # mod_skin_ecmwf.f90:57
RNUWL0 = 0.5       # mod_skin_ecmwf.f90:60


def cs_coare(Qsw, Qnsol, ustar, sst, Qlat):
    """CS_COARE (mod_skin_coare.f90:48-93)."""
    zQabs = Qnsol
    zdelta = delta_skin_layer(alpha_sw(sst), zQabs, ustar, Qlat=Qlat)
    for _ in range(4):
        # NB: the 0.01 floor can never bind here — fr >= 0.137 - 6.6e-5/8e-4
        # ~= 0.055 for any delta; it binds only in CS_ECMWF (fr0 = 0.065).
        zfr = max(0.137 + 11.0 * zdelta
                  - 6.6e-5 / zdelta * (1.0 - math.exp(-zdelta / 8.0e-4)),
                  0.01)
        zQabs = Qnsol + zfr * Qsw
        zdelta = delta_skin_layer(alpha_sw(sst), zQabs, ustar, Qlat=Qlat)
    return zQabs * zdelta / c.rk0_w


def cs_ecmwf(Qsw, Qnsol, ustar, sst):
    """CS_ECMWF (mod_skin_ecmwf.f90:68-110): fr0=0.065, no Qlat term."""
    zQabs = Qnsol
    zdelta = delta_skin_layer(alpha_sw(sst), zQabs, ustar)
    for _ in range(4):
        zfr = max(0.065 + 11.0 * zdelta
                  - 6.6e-5 / zdelta * (1.0 - math.exp(-zdelta / 8.0e-4)),
                  0.01)
        if zfr <= 0.01:
            HITS["cs_fr_floor"] += 1
        zQabs = Qnsol + zfr * Qsw
        zdelta = delta_skin_layer(alpha_sw(sst), zQabs, ustar)
    return zQabs * zdelta / c.rk0_w


def _wl_absorb(zHwl):
    """solar absorption fraction (mod_skin_coare.f90:167-168)"""
    return 1.0 - (0.28 * 0.014 * (1.0 - math.exp(-zHwl / 0.014))
                  + 0.27 * 0.357 * (1.0 - math.exp(-zHwl / 0.357))
                  + 0.45 * 12.82 * (1 - math.exp(-zHwl / 12.82))) / zHwl


def wl_coare(Qsw, Qnsol, Tau, sst, lon, isd, iwait, state,
             rdt=3600.0, gdept=1.0):
    """WL_COARE (mod_skin_coare.f90:97-250) with the literal early-exit
    cascade.  ``state`` is (dT_wl, Hz_wl, Qnt_ac, Tau_ac); returns the
    updated 4-tuple (unchanged when iwait /= 0)."""
    dT_wl, Hz_wl, Qnt_ac, Tau_ac = state

    l_exit = False
    l_destroy_wl = False
    zQabs = 0.0                                  # mod_skin_coare.f90:133

    zdTwl = dT_wl
    zHwl = max(min(Hz_wl, HWL_MAX), 0.1)
    zqac = Qnt_ac
    ztac = Tau_ac

    # local solar time (mod_skin_coare.f90:146-150)
    rlag_gw_h = -1.0 * ((360.0 - (lon % 360.0)) / 15.0 % 24.0)
    rlag_gw_h = -1.0 * fsign(min(abs(rlag_gw_h), abs(rlag_gw_h % 24.0)),
                             rlag_gw_h + 12.0)
    ilag_gw_s = int(rlag_gw_h * 3600.0)          # Fortran INT(): truncation
    isd_sol = (isd + ilag_gw_s) % (24 * 3600)
    rhr_sol = float(isd_sol) / 3600.0

    zalpha = alpha_sw(sst)
    zcd1 = math.sqrt(2.0 * RICH0 * c.rCp0_w / (zalpha * c.grav * c.rho0_w))
    zcd2 = (math.sqrt(2.0 * zalpha * c.grav / (RICH0 * c.rho0_w))
            / c.rCp0_w ** 1.5)

    if 4.0 < rhr_sol <= 6.5:                     # dawn reset
        HITS["wl_dawn_reset"] += 1
        l_exit = True
        l_destroy_wl = True

    if not l_exit:
        zfr = _wl_absorb(zHwl)
        zQabs = zfr * Qsw + Qnsol
        if abs(zdTwl) < 1.0e-6 and zQabs <= 0.0:
            HITS["wl_never_started"] += 1
            l_exit = True

    if (not l_exit) and (Qnt_ac + zQabs * rdt <= 0.0):
        HITS["wl_drained"] += 1
        l_exit = True
        l_destroy_wl = True

    if not l_exit:
        ztac = Tau_ac + max(0.002, Tau) * rdt
        for _ in range(5):
            zfr = _wl_absorb(zHwl)
            zQabs = zfr * Qsw + Qnsol
            zqac = Qnt_ac + zQabs * rdt
            if zqac <= 0.0:
                HITS["wl_inner_exit"] += 1
                break
            zHwl = max(min(HWL_MAX, zcd1 * ztac / math.sqrt(zqac)), 0.1)

        if zqac <= 0.0:
            l_destroy_wl = True
            l_exit = True
        else:
            HITS["wl_built"] += 1
            zdTwl = zcd2 * zqac ** 1.5 / ztac * max(zqac / abs(zqac), 0.0)
            flg = 0.5 + fsign(0.5, gdept - zHwl)
            zdTwl = zdTwl * (flg + (1.0 - flg) * gdept / zHwl)

    if l_destroy_wl:
        zdTwl = 0.0
        zHwl = HWL_MAX
        zqac = 0.0
        ztac = 0.0

    if iwait == 0:                               # commit (iwait flag)
        return (zdTwl, zHwl, zqac, ztac)
    return state


def _phi_takaya(zeta):
    """PHI, Takaya et al. 2010 Eq. 5 (mod_skin_ecmwf.f90:233-253)."""
    zzt2 = zeta * zeta
    ztf = 0.5 + fsign(0.5, zeta)
    return (ztf * (1.0 + (5.0 * zeta + 4.0 * zzt2)
                   / (1.0 + 3.0 * zeta + 0.25 * zzt2))
            + (1.0 - ztf) * 1.0 / math.sqrt(1.0 - 16.0 * (-abs(zeta))))


def wl_ecmwf(Qsw, Qnsol, ustar, sst, dT_wl, Hz_wl, rdt=3600.0, gdept=1.0,
             ustk=None):
    """WL_ECMWF (mod_skin_ecmwf.f90:113-230).  Returns new dT_wl
    (Hz_wl is the constant rd0 in this scheme)."""
    zHwl = Hz_wl

    flg = 0.5 + fsign(0.5, gdept - zHwl)
    ztcorr = flg + (1.0 - flg) * gdept / zHwl
    zdTwl_b = max(dT_wl / ztcorr, 0.0)

    zalpha = alpha_sw(sst)

    zfr = (1.0 - 0.28 * math.exp(-71.5 * zHwl)
           - 0.27 * math.exp(-2.8 * zHwl) - 0.45 * math.exp(-0.07 * zHwl))
    zQabs = zfr * Qsw + Qnsol

    zusw = max(ustar, 1.0e-4) * c.sq_radrw
    zusw2 = zusw * zusw

    if ustk is not None:
        zLa = math.sqrt(zusw / max(ustk, 1.0e-6))
    else:
        zLa = 0.3
    zfLa = max(zLa ** (-2.0 / 3.0), 1.0)

    zwf = 0.5 + fsign(0.5, zQabs)
    if zwf > 0.5:
        HITS["wl_ecmwf_warming"] += 1
    else:
        HITS["wl_ecmwf_cooling"] += 1

    zRhoCp_w = c.rho0_w * c.rCp0_w
    zcst1 = c.vkarmn * c.grav * zalpha
    zL2 = zcst1 * zQabs / (zRhoCp_w * zusw2 * zusw)
    zcst2 = zcst1 / (5.0 * zHwl * zusw2)
    zcst0 = rdt * (RNUWL0 + 1.0) / zHwl
    zA = zcst0 * zQabs / (RNUWL0 * zRhoCp_w)
    zcst3 = -zcst0 * c.vkarmn * zusw * zfLa

    zdTwl_n = zdTwl_b
    for _ in range(10):
        zdTwl_n = 0.5 * (zdTwl_n + zdTwl_b)
        zL1 = math.sqrt(zdTwl_n * zcst2)
        zeta = (1.0 - zwf) * zHwl * zL1 + zwf * zHwl * zL2
        zB = zcst3 / _phi_takaya(zeta)
        zdTwl_n = max(zdTwl_b + zA + zB * zdTwl_n, 0.0)

    return zdTwl_n * ztcorr
