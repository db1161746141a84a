"""Scalar transcriptions of the sea-ice bulk family.

Literal ports of:
  * psi_m/h_ice (Jordan-99)      mod_blk_ice_an05.f90:316-406 (copies in
                                 easy/best modules are identical)
  * rough_leng_m / rough_leng_tq mod_blk_ice_an05.f90:232-312
  * TURB_ICE_NEMO                mod_blk_ice_nemo.f90:68-155
  * TURB_ICE_EASY                mod_blk_ice_easy.f90:36-209
  * TURB_ICE_AN05                mod_blk_ice_an05.f90:51-228
  * TURB_ICE_LU12 (method #1)    mod_blk_ice_lu12.f90:51-215
  * TURB_ICE_LG15                mod_blk_ice_lg15.f90:51-308
  * TURB_ICE_BEST + Cx_Lupkes2015 mod_blk_ice_best.f90:46-293
  * CdN10_f_LU12/LU13, CdN_f_LU12_eq36, CdN_f_LG15(_light)
                                 mod_cdn_form_ice.f90:42-306
"""

import math

from aerobulk_tpu import constants as c

from . import HITS
from .phymbl import (f_h_louis, f_m_louis, fsign, one_on_l, ri_bulk,
                     un10_from_cd, visc_air, z0_from_cd,
                     cd_from_z0)

RPI = math.pi


# ---------------------------------------------------------------------------
# psi (Jordan et al. 1999)
# ---------------------------------------------------------------------------

def psi_m_ice_sc(zeta):
    """mod_blk_ice_an05.f90:316-360"""
    zx = abs(1.0 - 16.0 * zeta) ** 0.25
    zpsi_u = (math.log((1.0 + zx * zx) / 2.0)
              + 2.0 * math.log((1.0 + zx) / 2.0)
              - 2.0 * math.atan(zx) + 0.5 * RPI)
    zpsi_s = -(0.7 * zeta + 0.75 * (zeta - 14.3) * math.exp(-0.35 * zeta)
               + 10.7)
    zstab = 0.5 + fsign(0.5, zeta)
    return (1.0 - zstab) * zpsi_u + zstab * zpsi_s


def psi_h_ice_sc(zeta):
    """mod_blk_ice_an05.f90:363-406"""
    zx = abs(1.0 - 16.0 * zeta) ** 0.25
    zpsi_u = 2.0 * math.log((1.0 + zx * zx) / 2.0)
    zpsi_s = -(0.7 * zeta + 0.75 * (zeta - 14.3) * math.exp(-0.35 * zeta)
               + 10.7)
    zstab = 0.5 + fsign(0.5, zeta)
    return (1.0 - zstab) * zpsi_u + zstab * zpsi_s


# ---------------------------------------------------------------------------
# form-drag closures (mod_cdn_form_ice.f90)
# ---------------------------------------------------------------------------

_RCE_0 = 2.23e-3
_RNU_0 = 1.0
_RMU_0 = 1.0
_RBETA_0 = 1.4
_RHMIN_0 = 0.286
_RHMAX_0 = 0.534
_RDMIN_0 = 8.0
_RDMAX_0 = 300.0
_RZ0_W_0 = 3.27e-4
_RCE10_I_0 = 3.46e-3
_RALPHA_0 = 0.2


def _sc_hf_di(zfri):
    """parameterized sheltering/freeboard/floe length
    (mod_cdn_form_ice.f90:80-104)"""
    zfrw = 1.0 - zfri
    zSc = zfrw ** (1.0 / (10.0 * _RBETA_0))
    zhf = _RHMAX_0 * zfri + _RHMIN_0 * zfrw
    ztmp = 1.0 / (1.0 - (_RDMIN_0 / _RDMAX_0) ** (1.0 / _RBETA_0))
    zDi = _RDMIN_0 * (ztmp / (ztmp - zfri)) ** _RBETA_0
    return zSc, zhf, zDi


def cdn10_f_lu12_sc(zfri, z0w):
    """mod_cdn_form_ice.f90:42-114 (Eq. 22, V. Guemas bug-fixed form)"""
    zSc, zhf, zDi = _sc_hf_di(zfri)
    ztmp = 1.0 / z0w
    zrlog = math.log(zhf * ztmp) / math.log(10.0 * ztmp)
    return 0.5 * 0.3 * zrlog * zrlog * zSc * zhf / zDi * zfri


def cdn_f_lu12_eq36_sc(zu, zfri):
    """mod_cdn_form_ice.f90:117-142"""
    zhf = 0.41
    zDi = _RDMIN_0
    ztmp = 1.0 / _RZ0_W_0
    zrlog = math.log(zhf * ztmp) / math.log(zu * ztmp)
    return 0.5 * 0.3 * zrlog * zrlog * zhf / zDi * (1.0 - zfri) ** _RBETA_0


def cdn10_f_lu13_sc(zfri):
    """mod_cdn_form_ice.f90:147-193 (Eq. 50 level-4)"""
    zcoef = _RNU_0 + 1.0 / (10.0 * _RBETA_0)
    return _RCE_0 * zfri ** (_RMU_0 - 1.0) * (1.0 - zfri) ** zcoef


def cdn_f_lg15_sc(zu, zfri, z0i):
    """mod_cdn_form_ice.f90:196-268 (Eq. 21)"""
    zSc, zhf, zDi = _sc_hf_di(zfri)
    ztmp = 1.0 / z0i
    zrlog = math.log(zhf * ztmp / 2.718) / math.log(zu * ztmp)
    return 0.5 * 0.4 * zrlog * zrlog * zSc * zhf / zDi * zfri


def cdn_f_lg15_light_sc(zu, zfri, z0w):
    """mod_cdn_form_ice.f90:272-306 (Eq. 46)"""
    ztmp = 1.0 / z0w
    zrlog = math.log(10.0 * ztmp) / math.log(zu * ztmp)
    return _RCE10_I_0 * zrlog * zrlog * zfri * (1.0 - zfri) ** _RBETA_0


# ---------------------------------------------------------------------------
# AN05 roughness lengths
# ---------------------------------------------------------------------------

def rough_leng_m_sc(us, nua):
    """mod_blk_ice_an05.f90:232-255 (Eq. 19)"""
    zus = max(us, 1.0e-9)
    zz = (zus - 0.18) / 0.1
    return (0.135 * nua / zus
            + 0.035 * zus * zus / c.grav * (5.0 * math.exp(-zz * zz) + 1.0))


def rough_leng_tq_sc(z0, us, nua):
    """mod_blk_ice_an05.f90:257-312 (Andreas-1987 3-regime polynomial).
    Returns (z0t, z0q)."""
    zus = max(us, 1.0e-9)
    zre = max(zus * z0 / nua, 0.0)

    zsmoot = 0.5 + fsign(0.5, 0.135 - zre)
    ztrans = 0.5 + fsign(0.5, 2.49999 - zre) - zsmoot
    zrough = 0.5 + fsign(0.5, zre - 2.5)
    if zsmoot > 0.5:
        HITS["an05_smooth"] += 1
    elif zrough > 0.5:
        HITS["an05_rough"] += 1
    else:
        HITS["an05_transition"] += 1

    zlog = math.log(zre)
    zlog2 = zlog * zlog

    zb0 = zsmoot * 1.25 + ztrans * 0.149 + zrough * 0.317
    zb1 = -ztrans * 0.550 - zrough * 0.565
    zb2 = -zrough * 0.183
    z0t = z0 * math.exp(zb0 + zb1 * zlog + zb2 * zlog2)

    zb0 = zsmoot * 1.61 + ztrans * 0.351 + zrough * 0.396
    zb1 = -ztrans * 0.628 - zrough * 0.512
    zb2 = -zrough * 0.180
    z0q = z0 * math.exp(zb0 + zb1 * zlog + zb2 * zlog2)
    return z0t, z0q


# ---------------------------------------------------------------------------
# TURB_ICE_NEMO
# ---------------------------------------------------------------------------

def turb_ice_nemo_sc(zt, zu, Ts_i, t_zt, qs_i, q_zt, U_zu):
    """mod_blk_ice_nemo.f90:68-155: constant rCd_ice coefficients."""
    Ub = max(U_zu, c.wspd_thrshld_ice)
    t_zu = max(t_zt, 100.0)
    q_zu = max(q_zt, 0.1e-6)
    dt = t_zu - Ts_i
    dt = fsign(max(abs(dt), 1.0e-6), dt)
    dq = q_zu - qs_i
    dq = fsign(max(abs(dq), 1.0e-9), dq)
    Cd = c.rCd_ice
    sq = math.sqrt(c.rCd_ice)
    return dict(Cd=Cd, Ch=Cd, Ce=Cd, t_zu=t_zu, q_zu=q_zu, Ubzu=Ub,
                CdN=Cd, ChN=Cd, CeN=Cd,
                z0=z0_from_cd(zu, Cd),
                u_star=sq * Ub,
                L=1.0 / one_on_l(t_zu, q_zu, sq * Ub, c.rCd_ice / sq * dt,
                                 c.rCd_ice / sq * dq),
                UN10=sq * Ub / c.vkarmn
                * math.log(10.0 / z0_from_cd(zu, Cd)))


# ---------------------------------------------------------------------------
# TURB_ICE_EASY
# ---------------------------------------------------------------------------

def turb_ice_easy_sc(zt, zu, Ts_i, t_zt, qs_i, q_zt, U_zu,
                     CdN=1.4e-3, ChN=1.4e-3, CeN=1.4e-3, niter=5):
    """mod_blk_ice_easy.f90:36-209"""
    l_zt_equal_zu = abs(zu - zt) < 0.01
    zsqrtCDN = math.sqrt(CdN)
    zlog1 = math.log(zt / zu)
    zlog2 = math.log(zu / 10.0)

    Ubzu = max(U_zu, c.wspd_thrshld_ice)
    t_zu_i = max(t_zt, 100.0)
    q_zu_i = max(q_zt, 0.1e-6)

    Cd_i, Ch_i, Ce_i = CdN, ChN, CeN

    u_star = t_star = q_star = zeta_u = None
    for _ in range(niter):
        dt_zu = t_zu_i - Ts_i        # NB: un-floored inside the loop
        dq_zu = q_zu_i - qs_i

        ztmp0 = math.sqrt(Cd_i)
        u_star = ztmp0 * Ubzu
        ztmp0 = 1.0 / max(ztmp0, 1.0e-15)
        t_star = Ch_i * dt_zu * ztmp0
        q_star = Ce_i * dq_zu * ztmp0

        ztmp0 = one_on_l(t_zu_i, q_zu_i, u_star, t_star, q_star)
        ztmp0 = fsign(min(abs(ztmp0), 200.0), ztmp0)

        zeta_u = zu * ztmp0
        if abs(zeta_u) >= 50.0:
            HITS["easy_zeta_cap"] += 1
        zeta_u = fsign(min(abs(zeta_u), 50.0), zeta_u)
        if not l_zt_equal_zu:
            zeta_t = zt * ztmp0
            zeta_t = fsign(min(abs(zeta_t), 50.0), zeta_t)

        ztmp0 = 1.0 + zsqrtCDN / c.vkarmn * (zlog2 - psi_m_ice_sc(zeta_u))
        v = CdN / (ztmp0 * ztmp0)
        if v >= 1.9e-3:
            HITS["easy_cd_cap"] += 1
        Cd_i = min(max(v, c.Cx_min), 1.9e-3)

        ztmp0 = (zlog2 - psi_h_ice_sc(zeta_u)) / c.vkarmn / zsqrtCDN
        ztmp1 = math.sqrt(Cd_i) / zsqrtCDN
        Ch_i = min(max(ChN * ztmp1 / (1.0 + ChN * ztmp0), c.Cx_min), 1.9e-3)
        Ce_i = min(max(CeN * ztmp1 / (1.0 + CeN * ztmp0), c.Cx_min), 1.9e-3)

        if not l_zt_equal_zu:
            ztmp0 = psi_h_ice_sc(zeta_u) - psi_h_ice_sc(zeta_t) + zlog1
            t_zu_i = t_zt - t_star / c.vkarmn * ztmp0
            q_zu_i = max(0.0, q_zt - q_star / c.vkarmn * ztmp0)

    return dict(Cd=Cd_i, Ch=Ch_i, Ce=Ce_i, t_zu=t_zu_i, q_zu=q_zu_i,
                Ubzu=Ubzu, CdN=CdN, ChN=ChN, CeN=CeN,
                z0=z0_from_cd(zu, Cd_i, psi=psi_m_ice_sc(zeta_u)),
                u_star=u_star,
                L=1.0 / one_on_l(t_zu_i, q_zu_i, u_star, t_star, q_star),
                UN10=un10_from_cd(zu, Ubzu, Cd_i, psi_m_ice_sc(zeta_u)))


# ---------------------------------------------------------------------------
# TURB_ICE_AN05
# ---------------------------------------------------------------------------

def turb_ice_an05_sc(zt, zu, Ts_i, t_zt, qs_i, q_zt, U_zu, niter=5):
    """mod_blk_ice_an05.f90:51-228"""
    l_zt_equal_zu = abs(zu - zt) < 0.01

    Ubzu = max(U_zu, c.wspd_thrshld_ice)
    t_zu_i = max(t_zt, 100.0)
    q_zu_i = max(q_zt, 0.1e-6)

    dt_zu = t_zu_i - Ts_i
    dt_zu = fsign(max(abs(dt_zu), 1.0e-6), dt_zu)
    dq_zu = q_zu_i - qs_i
    dq_zu = fsign(max(abs(dq_zu), 1.0e-9), dq_zu)

    znu_a = visc_air(t_zu_i)

    z0 = 8.0e-4
    u_star = 0.035 * Ubzu * math.log(10.0 / z0) / math.log(zu / z0)
    z0 = rough_leng_m_sc(u_star, znu_a)
    for _ in range(2):
        u_star = max(Ubzu * c.vkarmn / (math.log(zu) - math.log(z0)), 1.0e-9)
        z0 = rough_leng_m_sc(u_star, znu_a)

    z0t, z0q = rough_leng_tq_sc(z0, u_star, znu_a)
    t_star = dt_zu * c.vkarmn / math.log(zu / z0t)
    q_star = dq_zu * c.vkarmn / math.log(zu / z0q)

    zeta_u = None
    for _ in range(niter):
        ztmp0 = one_on_l(t_zu_i, q_zu_i, u_star, t_star, q_star)
        ztmp0 = fsign(min(abs(ztmp0), 200.0), ztmp0)

        zeta_u = zu * ztmp0
        if abs(zeta_u) >= 50.0:
            HITS["an05_zeta_cap"] += 1
        zeta_u = fsign(min(abs(zeta_u), 50.0), zeta_u)
        if not l_zt_equal_zu:
            zeta_t = zt * ztmp0
            zeta_t = fsign(min(abs(zeta_t), 50.0), zeta_t)

        z0 = rough_leng_m_sc(u_star, znu_a)
        z0t, z0q = rough_leng_tq_sc(z0, u_star, znu_a)

        ztmp0 = psi_h_ice_sc(zeta_u)
        t_star = dt_zu * c.vkarmn / (math.log(zu) - math.log(z0t) - ztmp0)
        q_star = dq_zu * c.vkarmn / (math.log(zu) - math.log(z0q) - ztmp0)
        u_star = max(Ubzu * c.vkarmn
                     / (math.log(zu) - math.log(z0) - psi_m_ice_sc(zeta_u)),
                     1.0e-9)

        if not l_zt_equal_zu:
            ztmp1 = math.log(zt / zu) + ztmp0 - psi_h_ice_sc(zeta_t)
            t_zu_i = t_zt - t_star / c.vkarmn * ztmp1
            q_zu_i = q_zt - q_star / c.vkarmn * ztmp1
            dt_zu = t_zu_i - Ts_i
            dt_zu = fsign(max(abs(dt_zu), 1.0e-6), dt_zu)
            dq_zu = q_zu_i - qs_i
            dq_zu = fsign(max(abs(dq_zu), 1.0e-9), dq_zu)

    ztmp0 = u_star / Ubzu
    Cd = ztmp0 * ztmp0
    Ch = ztmp0 * t_star / dt_zu
    Ce = ztmp0 * q_star / dq_zu

    ztmp0 = 1.0 / math.log(zu / z0)
    return dict(Cd=Cd, Ch=Ch, Ce=Ce, t_zu=t_zu_i, q_zu=q_zu_i, Ubzu=Ubzu,
                CdN=c.vkarmn2 * ztmp0 * ztmp0,
                ChN=c.vkarmn2 * ztmp0 / math.log(zu / z0t),
                CeN=c.vkarmn2 * ztmp0 / math.log(zu / z0q),
                z0=z0, u_star=u_star,
                L=1.0 / one_on_l(t_zu_i, q_zu_i, u_star, t_star, q_star),
                UN10=u_star / c.vkarmn * math.log(10.0 / z0))


# ---------------------------------------------------------------------------
# TURB_ICE_LU12 (method #1)
# ---------------------------------------------------------------------------

_RZ0_I_S_0 = 0.69e-3
_RZ0_I_F_0 = 4.54e-4


def turb_ice_lu12_sc(zt, zu, Ts_i, t_zt, qs_i, q_zt, U_zu, frice):
    """mod_blk_ice_lu12.f90:51-215 (the active method #1)"""
    Ubzu = max(U_zu, c.wspd_thrshld_ice)
    t_zu_i = max(t_zt, 100.0)
    q_zu_i = max(q_zt, 0.1e-6)

    dt_zu = t_zu_i - Ts_i
    dt_zu = fsign(max(abs(dt_zu), 1.0e-6), dt_zu)
    dq_zu = q_zu_i - qs_i
    dq_zu = fsign(max(abs(dq_zu), 1.0e-9), dq_zu)

    Cd = cd_from_z0(zu, _RZ0_I_S_0) + cdn10_f_lu13_sc(frice)
    sq = math.sqrt(Cd)
    return dict(Cd=Cd, Ch=Cd, Ce=Cd, t_zu=t_zu_i, q_zu=q_zu_i, Ubzu=Ubzu,
                CdN=Cd, ChN=Cd, CeN=Cd,
                z0=z0_from_cd(zu, Cd), u_star=sq * Ubzu,
                L=1.0 / one_on_l(t_zu_i, q_zu_i, sq * Ubzu, Cd / sq * dt_zu,
                                 Cd / sq * dq_zu),
                UN10=sq * Ubzu / c.vkarmn
                * math.log(10.0 / z0_from_cd(zu, Cd)))


# ---------------------------------------------------------------------------
# TURB_ICE_LG15
# ---------------------------------------------------------------------------

def turb_ice_lg15_sc(zt, zu, Ts_i, t_zt, qs_i, q_zt, U_zu, frice, niter=5,
                     l_add_form_drag=True):
    """mod_blk_ice_lg15.f90:51-308"""
    l_zt_equal_zu = abs(zu - zt) < 0.01

    Ubzu = max(U_zu, c.wspd_thrshld_ice)
    t_zu_i = max(t_zt, 100.0)
    q_zu_i = max(q_zt, 0.1e-6)

    dt_zu = t_zu_i - Ts_i
    dt_zu = fsign(max(abs(dt_zu), 1.0e-6), dt_zu)
    dq_zu = q_zu_i - qs_i
    dq_zu = fsign(max(abs(dq_zu), 1.0e-9), dq_zu)

    zz0_s = _RZ0_I_S_0
    zCdN_s = cd_from_z0(zu, zz0_s)
    zChN_s = c.vkarmn2 / (math.log(zu / zz0_s)
                          * math.log(zu / (_RALPHA_0 * zz0_s)))

    zz0_f = 0.0
    zCdN_f = 0.0
    zChN_f = 0.0
    if l_add_form_drag:
        zz0_f = _RZ0_I_F_0
        zCdN_f = cdn_f_lg15_light_sc(zu, frice, zz0_f)
        zChN_f = zCdN_f / (1.0 + math.log(1.0 / _RALPHA_0) / c.vkarmn
                           * math.sqrt(zCdN_f))

    Cd_i = zCdN_s + zCdN_f
    Ch_i = zChN_s + zChN_f
    RiB = ri_bulk(zt, Ts_i, t_zt, qs_i, q_zt, Ubzu)

    for _ in range(niter):
        if not l_zt_equal_zu:
            xtmp1 = zCdN_s + zCdN_f
            xtmp2 = zz0_s + zz0_f
            xtmp1 = (math.log(zt / zu)
                     + f_h_louis(zu, RiB, xtmp1, xtmp2)
                     - f_h_louis(zt, RiB, xtmp1, xtmp2))
            xtmp2 = max(Ubzu + (math.sqrt(Cd_i) * Ubzu) * xtmp1,
                        c.wspd_thrshld_ice)
            xtmp2 = min(xtmp2, Ubzu)
            if xtmp2 >= Ubzu:
                HITS["lg15_uzt_capped"] += 1
        else:
            xtmp2 = Ubzu
        RiB = ri_bulk(zt, Ts_i, t_zt, qs_i, q_zt, xtmp2)

        Cd_i = zCdN_s * f_m_louis(zu, RiB, zCdN_s, zz0_s)
        Ch_i = zChN_s * f_h_louis(zu, RiB, zCdN_s, zz0_s)
        if l_add_form_drag:
            Cd_i = Cd_i + zCdN_f * f_m_louis(zu, RiB, zCdN_f, zz0_f)
            Ch_i = Ch_i + zChN_f * f_h_louis(zu, RiB, zCdN_f, zz0_f)

        if not l_zt_equal_zu:
            xtmp1 = zCdN_s + zCdN_f
            xtmp2 = zz0_s + zz0_f
            xtmp1 = (math.log(zt / zu)
                     + f_h_louis(zu, RiB, xtmp1, xtmp2)
                     - f_h_louis(zt, RiB, xtmp1, xtmp2))
            xtmp2 = 1.0 / math.sqrt(Cd_i)

            t_zu_i = t_zt - (Ch_i * dt_zu * xtmp2) / c.vkarmn * xtmp1
            q_zu_i = q_zt - (Ch_i * dq_zu * xtmp2) / c.vkarmn * xtmp1
            q_zu_i = max(0.0, q_zu_i)

            dt_zu = t_zu_i - Ts_i
            dq_zu = q_zu_i - qs_i
            dt_zu = fsign(max(abs(dt_zu), 1.0e-6), dt_zu)
            dq_zu = fsign(max(abs(dq_zu), 1.0e-9), dq_zu)

    Ce_i = Ch_i

    xtmp1 = math.sqrt(Cd_i)
    return dict(Cd=Cd_i, Ch=Ch_i, Ce=Ce_i, t_zu=t_zu_i, q_zu=q_zu_i,
                Ubzu=Ubzu,
                CdN=zCdN_s + zCdN_f, ChN=zChN_s + zChN_f,
                CeN=zChN_s + zChN_f,
                z0=z0_from_cd(zu, zCdN_s + zCdN_f),
                u_star=xtmp1 * Ubzu,
                L=1.0 / one_on_l(t_zu_i, q_zu_i, xtmp1 * Ubzu,
                                 Ch_i * dt_zu / xtmp1,
                                 Ce_i * dq_zu / xtmp1),
                UN10=xtmp1 * Ubzu / c.vkarmn
                * math.log(10.0 / z0_from_cd(zu, zCdN_s + zCdN_f)))


# ---------------------------------------------------------------------------
# TURB_ICE_BEST
# ---------------------------------------------------------------------------

_Z0_SKIN_ICE = 0.69e-3
_Z0_FORM_ICE = 0.57e-3
_Z0_ICE = 1.00e-3
_ZCE10 = 2.80e-3
_ZBETA = 1.1
_Z1_ALPHA = 1.0 / 0.2
_Z1_ALPHAF = _Z1_ALPHA


def cx_lupkes2015_sc(zu, t_zu, q_zu, Ui_zu, Ts_i, qs_i):
    """Cx_Lupkes2015 (mod_blk_ice_best.f90:209-293), one point.
    Returns (pcd, pch)."""
    zCdn_form_tmp = _ZCE10 * (math.log(10.0 / _Z0_FORM_ICE + 1.0)
                              / math.log(zu / _Z0_FORM_ICE + 1.0)) ** 2
    zCdn_skin_ice = (c.vkarmn / math.log(zu / _Z0_SKIN_ICE + 1.0)) ** 2
    zCdn_ice = zCdn_skin_ice
    zChn_skin_ice = c.vkarmn ** 2 / (
        math.log(zu / _Z0_ICE + 1.0)
        * math.log(zu * _Z1_ALPHA / _Z0_SKIN_ICE + 1.0))

    zfi = 1.0
    zwndspd_i = max(0.5, Ui_zu)
    zfo = 0.0

    zrib_i = ri_bulk(zu, Ts_i, t_zu, qs_i, q_zu, zwndspd_i)

    # Eq. 40 quirk: zfi * zfo**zbeta == 0 always (the "WHAT????" comment)
    zCdn_form_ice = zCdn_form_tmp * zfi * zfo ** _ZBETA
    zChn_form_ice = zCdn_form_ice / (
        1.0 + (math.log(_Z1_ALPHAF) / c.vkarmn) * math.sqrt(zCdn_form_ice))

    z0i = _Z0_SKIN_ICE
    zfmi = f_m_louis(zu, zrib_i, zCdn_ice, z0i)
    zfhi = f_h_louis(zu, zrib_i, zCdn_ice, z0i)

    ztmp = 1.0 / max(1.0e-6, zfi)
    pcd = zCdn_skin_ice * zfmi + zCdn_form_ice * (zfmi * zfi) * ztmp
    pch = zChn_skin_ice * zfhi + zChn_form_ice * (zfhi * zfi) * ztmp
    return pcd, pch


def turb_ice_best_sc(zt, zu, Ts_i, t_zt, qi_s, q_zt, U_zu, niter=5):
    """mod_blk_ice_best.f90:46-206"""
    l_zt_equal_zu = abs(zu - zt) < 0.01

    U_blk = max(U_zu, c.wspd_thrshld_ice)
    t_zu = t_zt
    q_zu = q_zt

    Cd, Ch = cx_lupkes2015_sc(zu, t_zu, q_zu, U_blk, Ts_i, qi_s)
    Ce = Ch
    sqrtCd = math.sqrt(Cd)
    sqrtCdn10 = sqrtCd    # (first-iteration UN10 uses this, as in the ref
    #                        where sqrtCdn10 is read before being set —
    #                        gfortran zero-init would differ; see test note)

    zeta_u = Cx_n10 = None
    for _ in range(niter):
        ztmp1 = t_zu - Ts_i
        ztmp2 = q_zu - qi_s

        ztmp0 = sqrtCd * U_blk
        ztmp1 = Ch / sqrtCd * ztmp1
        ztmp2 = Ce / sqrtCd * ztmp2

        ztmp0 = one_on_l(t_zu, q_zu, ztmp0, ztmp1, ztmp2)

        zeta_u = zu * ztmp0
        if abs(zeta_u) >= 10.0:
            HITS["best_zeta_cap"] += 1
        zeta_u = fsign(min(abs(zeta_u), 10.0), zeta_u)

        if not l_zt_equal_zu:
            ztmp0 = zt * ztmp0
            ztmp0 = fsign(min(abs(ztmp0), 10.0), ztmp0)
            ztmp0 = (math.log(zt / zu) + psi_h_ice_sc(zeta_u)
                     - psi_h_ice_sc(ztmp0))
            t_zu = t_zt - ztmp1 / c.vkarmn * ztmp0
            q_zu = q_zt - ztmp2 / c.vkarmn * ztmp0
            q_zu = max(0.0, q_zu)

        ztmp2 = psi_m_ice_sc(zeta_u)
        ztmp0 = max(c.wspd_thrshld_ice,
                    U_blk / (1.0 + sqrtCdn10 / c.vkarmn
                             * (math.log(zu / 10.0) - ztmp2)))

        Cd, Cx_n10 = cx_lupkes2015_sc(zu, t_zu, q_zu, ztmp0, Ts_i, qi_s)
        sqrtCdn10 = math.sqrt(Cd)

        ztmp1 = 1.0 + sqrtCdn10 / c.vkarmn * (math.log(zu / 10.0) - ztmp2)
        Cd = Cd / (ztmp1 * ztmp1)
        sqrtCd = math.sqrt(Cd)

        ztmp0 = ((math.log(zu / 10.0) - psi_h_ice_sc(zeta_u)) / c.vkarmn
                 / sqrtCdn10)
        ztmp2 = sqrtCd / sqrtCdn10
        ztmp1 = 1.0 + Cx_n10 * ztmp0
        Ch = Cx_n10 * ztmp2 / ztmp1
        Ce = Ch

    return dict(Cd=Cd, Ch=Ch, Ce=Ce, t_zu=t_zu, q_zu=q_zu, Ubzu=U_blk,
                CdN=sqrtCdn10 * sqrtCdn10, ChN=Ch, CeN=Ce,
                z0=z0_from_cd(zu, Cd, psi=psi_m_ice_sc(zeta_u)),
                u_star=math.sqrt(Cd) * U_blk,
                L=zu / zeta_u,
                UN10=U_blk / (1.0 + sqrtCdn10 / c.vkarmn
                              * (math.log(zu / 10.0)
                                 - psi_m_ice_sc(zeta_u))))
