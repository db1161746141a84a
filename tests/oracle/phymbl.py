"""Scalar transcriptions of mod_phymbl.f90 (the *_SCLR routines).

Literal ports — same constants, same evaluation order, same clamps.
Each function cites the reference as mod_phymbl.f90:LINE.
All floats are Python floats == IEEE binary64 == the reference's wp
(compiled with -fdefault-real-8, so untyped literals are double too).
"""

import math

from aerobulk_tpu import constants as c

from . import HITS


def fsign(a, b):
    """Fortran SIGN(a, b)."""
    return math.copysign(abs(a), b)


def visc_air(Ta):
    """mod_phymbl.f90:549-563"""
    tc = Ta - c.rt0
    tc2 = tc * tc
    return 1.326e-5 * (1.0 + 6.542e-3 * tc + 8.301e-6 * tc2
                       - 4.84e-9 * tc2 * tc)


def rho_air(Ta, qa, slp):
    """mod_phymbl.f90:522-537"""
    r = slp / (c.R_dry * Ta * (1.0 + c.rctv0 * qa))
    if r <= 0.8:
        HITS["rho_air_floor"] += 1
    return max(r, 0.8)


def l_vap(sst):
    """mod_phymbl.f90:579-592"""
    return (2.501 - 0.00237 * (sst - c.rt0)) * 1.0e6


def cp_air(qa):
    """mod_phymbl.f90:603-616"""
    return c.rCp_dry + c.rCp_vap * qa


def virt_temp(Ta, qa):
    """mod_phymbl.f90:247-269"""
    return Ta * (1.0 + c.rctv0 * qa)


def one_on_l(Thta, qa, us, ts, qs):
    """mod_phymbl.f90:666-693 (internal |.|<=200 clamp included)"""
    zqa = 1.0 + c.rctv0 * qa
    ool = (c.grav * c.vkarmn * (ts * zqa + c.rctv0 * Thta * qs)
           / max(us * us * Thta * zqa, 1.0e-9))
    if abs(ool) >= 200.0:
        HITS["one_on_l_cap"] += 1
    return fsign(min(abs(ool), 200.0), ool)


def ri_bulk(z, sst, Thta, ssq, qa, ub):
    """mod_phymbl.f90:712-747 (no pTa_layer variant, as the algos use it)"""
    sstv = virt_temp(sst, ssq)
    dthv = virt_temp(Thta, qa) - sstv
    tv = 0.5 * (sstv + virt_temp(Thta - c.rgamma_dry * z, qa))
    return c.grav * dthv * z / (tv * ub * ub)


def e_sat(Ta):
    """Goff 1957 over water (mod_phymbl.f90:777-800)"""
    zta = max(Ta, 180.0)
    ztmp = c.rt0 / zta
    return 100.0 * (10.0 ** (
        10.79574 * (1.0 - ztmp) - 5.028 * math.log10(zta / c.rt0)
        + 1.50475e-4 * (1.0 - 10.0 ** (-8.2969 * (zta / c.rt0 - 1.0)))
        + 0.42873e-3 * (10.0 ** (4.76955 * (1.0 - ztmp)) - 1.0) + 0.78614))


_rAg_i = -9.09718
_rBg_i = -3.56654
_rCg_i = 0.876793
_rDg_i = math.log10(6.1071)


def e_sat_ice(Ta):
    """Goff over ice (mod_phymbl.f90:815-830)"""
    zta = max(Ta, 180.0)
    ztmp = c.rtt0 / zta
    zle = (_rAg_i * (ztmp - 1.0) + _rBg_i * math.log10(ztmp)
           + _rCg_i * (1.0 - zta / c.rtt0) + _rDg_i)
    return 100.0 * 10.0 ** zle


def de_sat_dt_ice(Ta):
    """mod_phymbl.f90:845-861"""
    zta = max(Ta, 180.0)
    zde = (-(_rAg_i * c.rtt0) / (zta * zta)
           - _rBg_i / (zta * math.log(10.0)) - _rCg_i / c.rtt0)
    return math.log(10.0) * zde * e_sat_ice(zta)


def q_sat(Ta, slp, l_ice=False):
    """mod_phymbl.f90:881-904"""
    ze_s = e_sat_ice(Ta) if l_ice else e_sat(Ta)
    return c.reps0 * ze_s / (slp - (1.0 - c.reps0) * ze_s)


def dq_sat_dt_ice(Ta, slp):
    """mod_phymbl.f90:926-945"""
    ze_s = e_sat_ice(Ta)
    zde_s_dt = de_sat_dt_ice(Ta)
    ztmp = (c.reps0 - 1.0) * ze_s + slp
    return c.reps0 * slp * zde_s_dt / (ztmp * ztmp)


def qlw_net(dwlw, ts, l_ice=False):
    """mod_phymbl.f90:1291-1314"""
    zemiss = c.emiss_i if l_ice else c.emiss_w
    zt2 = ts * ts
    return zemiss * (dwlw - c.stefan * zt2 * zt2)


def alpha_sw(sst):
    """mod_phymbl.f90:1267-1286"""
    return 2.1e-5 * max(sst - c.rt0 + 3.2, 0.0) ** 0.79


def bulk_formula(zu, ts, qs, Thta, qa, Cd, Ch, Ce, wnd, Ub, slp,
                 l_ice=False):
    """BULK_FORMULA_SCLR (mod_phymbl.f90:1149-1203).
    Returns (Tau, Qsen, Qlat, Evap, rhoa)."""
    zta = Thta - c.rgamma_dry * zu
    zrho = rho_air(zta, qa, slp)
    zrho = rho_air(zta, qa, slp - zrho * c.grav * zu)
    zUrho = Ub * max(zrho, 1.0)
    Tau = zUrho * Cd * wnd
    zevap = zUrho * Ce * (qa - qs)
    Qsen = zUrho * Ch * (Thta - ts) * cp_air(qa)
    if l_ice:
        Qlat = c.rLsub * zevap
        Evap = min(zevap, 0.0)
    else:
        Qlat = l_vap(ts) * zevap
        Evap = zevap
    return Tau, Qsen, Qlat, Evap, zrho


def update_qnsol_tau(zu, ts, qs, Thta, qa, ust, tst, qst, wnd, Ub, slp,
                     rlw):
    """UPDATE_QNSOL_TAU_SCLR (mod_phymbl.f90:1059-1103).
    Returns (Qns, Tau, Qlat)."""
    zdt = Thta - ts
    zdt = fsign(max(abs(zdt), 1.0e-9), zdt)
    zdq = qa - qs
    zdq = fsign(max(abs(zdq), 1.0e-12), zdq)
    zz0 = ust / Ub
    zCd = zz0 * zz0
    zCh = zz0 * tst / zdt
    zCe = zz0 * qst / zdq
    Tau, zQsen, zQlat, _, _ = bulk_formula(zu, ts, qs, Thta, qa,
                                           zCd, zCh, zCe, wnd, Ub, slp)
    zQlw = qlw_net(rlw, ts)
    return zQlat + zQsen + zQlw, Tau, zQlat


def z0_from_cd(zu, Cd, psi=None):
    """mod_phymbl.f90:1335-1352"""
    if psi is None:
        return zu * math.exp(-c.vkarmn / math.sqrt(Cd))
    return zu * math.exp(-(c.vkarmn / math.sqrt(Cd) + psi))


def cd_from_z0(zu, z0, psi=None):
    """mod_phymbl.f90:1396-1414"""
    if psi is None:
        r = 1.0 / math.log(zu / z0)
    else:
        r = 1.0 / (math.log(zu / z0) - psi)
    return c.vkarmn2 * r * r


_rc_louis = 5.0
_rc2_louis = _rc_louis * _rc_louis
_ram_louis = 2.0 * _rc_louis
_rah_louis = 3.0 * _rc_louis


def f_m_louis(zu, Rib, Cdn, z0):
    """Louis 1979 momentum fn (mod_phymbl.f90:1419-1440)"""
    zstab = 0.5 + fsign(0.5, Rib)
    ztu = Rib / (1.0 + 3.0 * _rc2_louis * Cdn
                 * math.sqrt(abs(-Rib * (zu / z0 + 1.0))))
    zts = Rib / math.sqrt(abs(1.0 + Rib))
    if zstab > 0.5:
        HITS["louis_stable"] += 1
    else:
        HITS["louis_unstable"] += 1
    return ((1.0 - zstab) * (1.0 - _ram_louis * ztu)
            + zstab / (1.0 + _ram_louis * zts))


def f_h_louis(zu, Rib, Chn, z0):
    """Louis 1979 heat fn (mod_phymbl.f90:1458-1479)"""
    zstab = 0.5 + fsign(0.5, Rib)
    ztu = Rib / (1.0 + 3.0 * _rc2_louis * Chn
                 * math.sqrt(abs(-Rib * (zu / z0 + 1.0))))
    zts = Rib / math.sqrt(abs(1.0 + Rib))
    return ((1.0 - zstab) * (1.0 - _rah_louis * ztu)
            + zstab / (1.0 + _rah_louis * zts))


def un10_from_ustar(zu, Uzu, us, psi):
    """mod_phymbl.f90:1498-1510"""
    return Uzu - us / c.vkarmn * (math.log(zu / 10.0) - psi)


def un10_from_cd(zu, Ub, Cd, psi):
    """mod_phymbl.f90:1532-1549"""
    return (math.sqrt(Cd) * Ub / c.vkarmn
            * math.log(10.0 / z0_from_cd(zu, Cd, psi=psi)))


# LKB table (mod_phymbl.f90:1650-1660)
_XA = ((0.177, 1.376, 1.026, 1.625, 4.661, 34.904, 1667.19, 5.88e5),
       (0.292, 1.808, 1.393, 1.956, 4.994, 30.709, 1448.68, 2.98e5))
_XB = ((0.0, 0.929, -0.599, -1.018, -1.475, -2.067, -2.907, -3.935),
       (0.0, 0.826, -0.528, -0.870, -1.297, -1.845, -2.682, -3.616))
_XRAN = (0.0, 0.11, 0.825, 3.0, 10.0, 30.0, 100.0, 300.0, 1000.0)


def z0tq_lkb(iflag, Rer, z0):
    """z0tq_LKB with the literal DO WHILE (mod_phymbl.f90:1635-1701)"""
    zz = -999.0
    if 0.0 < Rer < 1000.0:
        jm = 0
        found = False
        while not found:
            jm += 1
            found = _XRAN[jm - 1] < Rer <= _XRAN[jm]
        zz = _XA[iflag - 1][jm - 1] * Rer ** _XB[iflag - 1][jm - 1] * z0 / Rer
    else:
        HITS["lkb_out_of_range"] += 1
    return min(max(abs(zz), 1.0e-9), 0.05)


def delta_skin_layer(palpha, pQd, pustar_a, Qlat=None):
    """delta_skin_layer_sclr (mod_phymbl.f90:2010-2046)"""
    zQd = pQd
    if Qlat is not None:
        zQd = pQd + 0.026 * min(Qlat, 0.0) * c.rCp0_w / c.rLevap / palpha
    ztf = 0.5 + fsign(0.5, zQd)
    if ztf > 0.5:
        HITS["skin_layer_warming"] += 1
    zusw = max(pustar_a, 1.0e-4) * c.sq_radrw
    zusw2 = zusw * zusw
    zlamb = 6.0 * (1.0 + max(palpha * c.rcst_cs / (zusw2 * zusw2) * zQd,
                             0.0) ** 0.75) ** (-1.0 / 3.0)
    ztmp = c.rnu0_w / zusw
    return (1.0 - ztf) * zlamb * ztmp + ztf * min(6.0 * ztmp, 0.007)


def q_air_rh(rha, Ta, slp):
    """mod_phymbl.f90:963-985"""
    ze = 0.01 * rha * e_sat(Ta)
    return ze * c.reps0 / max(slp - (1.0 - c.reps0) * ze, 1.0)


def q_air_dp(da, slp):
    """mod_phymbl.f90:990-1000"""
    e = max(e_sat(da), 0.0)
    return e * c.reps0 / max(slp - (1.0 - c.reps0) * e, 1.0)


def pz_from_p0_tz_qz(z, slp, Ta, qa):
    """Pz_from_P0_tz_qz_sclr, 3-iteration barometric fixed point
    (mod_phymbl.f90:283-318)."""
    R_gas = 8.314510
    mm_dry = 28.9647e-3
    mm_w = 18.0153e-3
    pa = slp
    for _ in range(3):
        f = qa / q_sat(Ta, pa)
        xm = (1.0 - f) * mm_dry + f * mm_w
        pa = slp * math.exp(-c.grav * xm * z / (R_gas * Ta))
    return pa


def theta_from_z_p0_t_q(z, slp, Ta, qa):
    """Theta_from_z_P0_T_q_sclr (mod_phymbl.f90:343-365)."""
    Pz = pz_from_p0_tz_qz(z, slp, Ta, qa)
    return Ta * (slp / Pz) ** (c.R_dry / c.rCp_dry)
