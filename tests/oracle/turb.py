"""Scalar transcriptions of the five ocean TURB routines + helpers.

Literal statement-by-statement ports of:
  * psi_m/h_coare            mod_common_coare.f90:217-392
  * FIRST_GUESS_COARE_SCLR   mod_common_coare.f90:33-179
  * TURB_COARE3P0            mod_blk_coare3p0.f90:106-358
  * TURB_COARE3P6            mod_blk_coare3p6.f90:123-413
  * psi_m/h_ecmwf, cap_zeta  mod_blk_ecmwf.f90:441-564
  * TURB_ECMWF               mod_blk_ecmwf.f90:63-383
  * psi_m/h_ncar             mod_blk_ncar.f90:333-419
  * TURB_NCAR                mod_blk_ncar.f90:57-240
  * psi_m/h_andreas          mod_blk_andreas.f90:307-410
  * TURB_ANDREAS             mod_blk_andreas.f90:66-272

Version quirks preserved on purpose (they are load-bearing for parity):
  * COARE3P0 evaluates air viscosity at t_zt (mod_blk_coare3p0.f90:238)
    while COARE3P6 uses the first-guess t_zu (mod_blk_coare3p6.f90:294);
  * ECMWF evaluates it at t_zt too (mod_blk_ecmwf.f90:238);
  * the WL_COARE commit flag is MOD(nb_iter, jit) (mod_blk_coare3p6.f90:370),
    i.e. the state commits whenever jit divides nb_iter, not only at the end.
"""

import math

from aerobulk_tpu import constants as c

from . import HITS
from .phymbl import (fsign, one_on_l, q_sat, ri_bulk, un10_from_cd,
                     un10_from_ustar, update_qnsol_tau, virt_temp, visc_air,
                     z0_from_cd, z0tq_lkb)
from .skin import cs_coare, cs_ecmwf, wl_coare, wl_ecmwf

RPI = math.pi


# ---------------------------------------------------------------------------
# psi families
# ---------------------------------------------------------------------------

def psi_m_coare_sc(zeta):
    """mod_common_coare.f90:217-254"""
    phi_m = abs(1.0 - 15.0 * zeta) ** 0.25
    psi_k = (2.0 * math.log((1.0 + phi_m) / 2.0)
             + math.log((1.0 + phi_m * phi_m) / 2.0)
             - 2.0 * math.atan(phi_m) + 0.5 * RPI)
    phi_c = abs(1.0 - 10.15 * zeta) ** 0.3333
    psi_c = (1.5 * math.log((1.0 + phi_c + phi_c * phi_c) / 3.0)
             - 1.7320508 * math.atan((1.0 + 2.0 * phi_c) / 1.7320508)
             + 1.813799447)
    f = zeta * zeta
    f = f / (1.0 + f)
    zc = min(50.0, 0.35 * zeta)
    stb = 0.5 + fsign(0.5, zeta)
    return ((1.0 - stb) * ((1.0 - f) * psi_k + f * psi_c)
            - stb * (1.0 + 1.0 * zeta
                     + 0.6667 * (zeta - 14.28) / math.exp(zc) + 8.525))


def psi_h_coare_sc(zeta):
    """mod_common_coare.f90:305-344"""
    phi_h = (abs(1.0 - 15.0 * zeta)) ** 0.5
    psi_k = 2.0 * math.log((1.0 + phi_h) / 2.0)
    phi_c = (abs(1.0 - 34.15 * zeta)) ** 0.3333
    psi_c = (1.5 * math.log((1.0 + phi_c + phi_c * phi_c) / 3.0)
             - 1.7320508 * math.atan((1.0 + 2.0 * phi_c) / 1.7320508)
             + 1.813799447)
    f = zeta * zeta
    f = f / (1.0 + f)
    zc = min(50.0, 0.35 * zeta)
    stb = 0.5 + fsign(0.5, zeta)
    return ((1.0 - stb) * ((1.0 - f) * psi_k + f * psi_c)
            - stb * ((abs(1.0 + 2.0 * zeta / 3.0)) ** 1.5
                     + 0.6667 * (zeta - 14.28) / math.exp(zc) + 8.525))


def _cap_zeta(zeta):
    """mod_blk_ecmwf.f90:551-564"""
    if zeta <= -50.0 or zeta >= 5.0:
        HITS["ecmwf_zeta_cap"] += 1
    return min(max(zeta, -50.0), 5.0)


def psi_m_ecmwf_sc(zeta):
    """mod_blk_ecmwf.f90:441-477"""
    zc = 5.0 / 0.35
    zta = _cap_zeta(zeta)
    x2 = math.sqrt(abs(1.0 - 16.0 * zta))
    x = math.sqrt(x2)
    t = 1.0 + x
    psi_unst = (math.log(0.125 * t * t * (1.0 + x2))
                - 2.0 * math.atan(x) + 0.5 * RPI)
    psi_stab = (-2.0 / 3.0 * (zta - zc) * math.exp(-0.35 * zta)
                - zta - 2.0 / 3.0 * zc)
    stb = 0.5 + fsign(0.5, zta)
    return stb * psi_stab + (1.0 - stb) * psi_unst


def psi_h_ecmwf_sc(zeta):
    """mod_blk_ecmwf.f90:498-533"""
    zc = 5.0 / 0.35
    zta = _cap_zeta(zeta)
    x2 = math.sqrt(abs(1.0 - 16.0 * zta))
    psi_unst = 2.0 * math.log(0.5 * (1.0 + x2))
    psi_stab = (-2.0 / 3.0 * (zta - zc) * math.exp(-0.35 * zta)
                - abs(1.0 + 2.0 / 3.0 * zta) ** 1.5 - 2.0 / 3.0 * zc + 1.0)
    stb = 0.5 + fsign(0.5, zta)
    return stb * psi_stab + (1.0 - stb) * psi_unst


def psi_m_ncar_sc(zeta):
    """mod_blk_ncar.f90:333-363"""
    x2 = max(math.sqrt(abs(1.0 - 16.0 * zeta)), 1.0)
    x = math.sqrt(x2)
    psi_unst = (2.0 * math.log((1.0 + x) * 0.5)
                + math.log((1.0 + x2) * 0.5)
                - 2.0 * math.atan(x) + RPI * 0.5)
    psi_stab = -5.0 * zeta
    stb = 0.5 + fsign(0.5, zeta)
    return stb * psi_stab + (1.0 - stb) * psi_unst


def psi_h_ncar_sc(zeta):
    """mod_blk_ncar.f90:379-407"""
    x2 = max(math.sqrt(abs(1.0 - 16.0 * zeta)), 1.0)
    psi_unst = 2.0 * math.log(0.5 * (1.0 + x2))
    psi_stab = -5.0 * zeta
    stb = 0.5 + fsign(0.5, zeta)
    return stb * psi_stab + (1.0 - stb) * psi_unst


def psi_m_andreas_sc(zeta):
    """mod_blk_andreas.f90:307-360"""
    am = 5.0
    bm = am / 6.5
    third = 1.0 / 3.0
    sr3 = math.sqrt(3.0)
    zta = min(zeta, 15.0)
    if zeta >= 15.0:
        HITS["andreas_zeta_cap"] += 1
    x2 = max(math.sqrt(abs(1.0 - 16.0 * zta)), 1.0)
    x = math.sqrt(x2)
    psi_unst = (2.0 * math.log(abs((1.0 + x) * 0.5))
                + math.log(abs((1.0 + x2) * 0.5))
                - 2.0 * math.atan(x) + RPI * 0.5)
    xs = abs(1.0 + zta) ** third
    bbm = abs((1.0 - bm) / bm) ** third
    psi_stab = (-3.0 * am / bm * (xs - 1.0) + am * bbm / (2.0 * bm) * (
        2.0 * math.log(abs((xs + bbm) / (1.0 + bbm)))
        - math.log(abs((xs * xs - xs * bbm + bbm * bbm)
                       / (1.0 - bbm + bbm * bbm)))
        + 2.0 * sr3 * (math.atan((2.0 * xs - bbm) / (sr3 * bbm))
                       - math.atan((2.0 - bbm) / (sr3 * bbm)))))
    stb = 0.5 + fsign(0.5, zta)
    return stb * psi_stab + (1.0 - stb) * psi_unst


def psi_h_andreas_sc(zeta):
    """mod_blk_andreas.f90:363-410"""
    ah = 5.0
    bh = 5.0
    ch = 3.0
    bbh = math.sqrt(5.0)
    zta = min(zeta, 15.0)
    x2 = max(math.sqrt(abs(1.0 - 16.0 * zta)), 1.0)
    psi_unst = 2.0 * math.log(0.5 * (1.0 + x2))
    zz = 2.0 * zta + ch
    psi_stab = (-0.5 * bh * math.log(abs(1.0 + ch * zta + zta * zta))
                + (-ah / bbh + 0.5 * bh * ch / bbh)
                * (math.log(abs((zz - bbh) / (zz + bbh)))
                   - math.log(abs((ch - bbh) / (ch + bbh)))))
    stb = 0.5 + fsign(0.5, zta)
    return stb * psi_stab + (1.0 - stb) * psi_unst


# ---------------------------------------------------------------------------
# Charnock closures
# ---------------------------------------------------------------------------

def charn_coare3p0_sc(w):
    """mod_blk_coare3p0.f90:420-447"""
    zgt10 = 0.5 + fsign(0.5, w - 10.0)
    zgt18 = 0.5 + fsign(0.5, w - 18.0)
    if zgt18 > 0.5:
        HITS["charn30_sat"] += 1
    elif zgt10 > 0.5:
        HITS["charn30_ramp"] += 1
    return ((1.0 - zgt10) * 0.011
            + zgt10 * ((1.0 - zgt18) * (0.011 + (0.018 - 0.011)
                                        * (w - 10.0) / (18.0 - 10.0))
                       + zgt18 * 0.018))


def charn_coare3p6_sc(w):
    """mod_blk_coare3p6.f90:417-432"""
    v = 0.0017 * w - 0.005
    if v >= 0.028:
        HITS["charn36_sat"] += 1
    if v <= 0.0:
        HITS["charn36_zero"] += 1
    return max(min(v, 0.028), 0.0)


# ---------------------------------------------------------------------------
# FIRST_GUESS_COARE
# ---------------------------------------------------------------------------

def first_guess_coare_sc(zt, zu, psst, t_zt, pssq, q_zt, U_zu, pcharn):
    """FIRST_GUESS_COARE_SCLR (mod_common_coare.f90:33-179).
    Returns (us, ts, qs, t_zu, q_zu, Ubzu, z0)."""
    l_zt_equal_zu = abs(zu - zt) < 0.01

    t_zu = max(t_zt, 180.0)
    q_zu = max(q_zt, 1.0e-6)

    zz0 = 0.0001

    zlog_10 = math.log(10.0)
    zlog_zt = math.log(zt)
    zlog_zu = math.log(zu)
    zc_a = 0.035 * math.log(10.0 / zz0) / math.log(zu / zz0)
    zc_b = 0.004 * 600.0 * 1.2 * 1.2 * 1.2     # zzi0 * Beta0^3

    zdt = t_zu - psst
    zdt = fsign(max(abs(zdt), 1.0e-9), zdt)
    zdq = q_zu - pssq
    zdq = fsign(max(abs(zdq), 1.0e-12), zdq)

    zNu_a = visc_air(t_zu)
    zUb = math.sqrt(U_zu * U_zu + 0.5 * 0.5)
    zus = zc_a * zUb

    zz0 = pcharn * zus * zus / c.grav + 0.11 * zNu_a / zus
    zz0 = min(max(abs(zz0), 1.0e-8), 1.0)
    zlog_z0 = math.log(zz0)

    zCd = (c.vkarmn / (zlog_zu - zlog_z0)) ** 2
    z1_o_sqrt_Cd10 = (zlog_10 - zlog_z0) / c.vkarmn

    zz0t = 10.0 / math.exp(c.vkarmn / (0.00115 * z1_o_sqrt_Cd10))
    zz0t = min(max(abs(zz0t), 1.0e-8), 1.0)
    zlog_z0t = math.log(zz0t)

    zRib = ri_bulk(zu, psst, t_zu, pssq, q_zu, zUb)

    zcc = c.vkarmn2 / (zCd * (zlog_zt - zlog_z0t))
    zcc_ri = zcc * zRib
    z1_o_Ribcu = -zc_b / zu
    zstab = 0.5 + fsign(0.5, zRib)
    if zstab > 0.5:
        HITS["fg_stable"] += 1
    else:
        HITS["fg_unstable"] += 1
    zzeta_u = ((1.0 - zstab) * zcc_ri / (1.0 + zRib * z1_o_Ribcu)
               + zstab * (zcc_ri + 27.0 / 9.0 * zRib * zRib))

    zus = max(zUb * c.vkarmn / (zlog_zu - zlog_z0
                                - psi_m_coare_sc(zzeta_u)), 1.0e-9)
    ztmp = c.vkarmn / (zlog_zu - zlog_z0t - psi_h_coare_sc(zzeta_u))
    zts = zdt * ztmp
    zqs = zdq * ztmp

    if not l_zt_equal_zu:
        zzeta_t = zt * zzeta_u / zu
        zprf = (math.log(zt / zu) + psi_h_coare_sc(zzeta_u)
                - psi_h_coare_sc(zzeta_t))
        t_zu = t_zt - zts / c.vkarmn * zprf
        q_zu = q_zt - zqs / c.vkarmn * zprf
        if q_zu < 0.0:
            HITS["fg_qzu_clip"] += 1
        q_zu = (0.5 + fsign(0.5, q_zu)) * q_zu
        zdt = t_zu - psst
        zdt = fsign(max(abs(zdt), 1.0e-9), zdt)
        zdq = q_zu - pssq
        zdq = fsign(max(abs(zdq), 1.0e-12), zdq)
        zts = zdt * ztmp
        zqs = zdq * ztmp

    # pz0 output: recomputed with the new zus (mod_common_coare.f90:173-177)
    zz0 = pcharn * zus * zus / c.grav + 0.11 * zNu_a / zus
    pz0 = min(max(abs(zz0), 1.0e-8), 1.0)

    return zus, zts, zqs, t_zu, q_zu, zUb, pz0


# ---------------------------------------------------------------------------
# TURB_COARE3P0 / TURB_COARE3P6
# ---------------------------------------------------------------------------

_COARE_VERSIONS = {
    # charn, z0t_max, z0t_coef, z0t_pow, Beta0, visc at first-guess t_zu?
    "coare3p0": (charn_coare3p0_sc, 1.1e-4, 5.5e-5, 0.6, 1.25, False),
    "coare3p6": (charn_coare3p6_sc, 1.6e-4, 5.8e-5, 0.72, 1.2, True),
}
_ZI0_COARE = 600.0
_ZETA_ABS_MAX = 50.0


def turb_coare_sc(version, zt, zu, T_s, t_zt, q_s, q_zt, U_zu, niter=5,
                  use_cs=False, use_wl=False, Qsw=None, rad_lw=None,
                  slp=None, isecday_utc=None, lon=None, wl_state=None,
                  rdt=3600.0, gdept=1.0):
    """TURB_COARE3P0 (mod_blk_coare3p0.f90:106-358) / TURB_COARE3P6
    (mod_blk_coare3p6.f90:123-413), one point.

    ``wl_state`` is (dT_wl, Hz_wl, Qnt_ac, Tau_ac).  Returns (out dict,
    new wl_state)."""
    charn, z0t_max, z0t_coef, z0t_pow, Beta0, visc_at_tzu = \
        _COARE_VERSIONS[version]
    l_zt_equal_zu = abs(zu - zt) < 0.01
    zm_ztzu = 0.0 if l_zt_equal_zu else 1.0

    if wl_state is None:
        wl_state = (0.0, 20.0, 0.0, 0.0)
    dT_wl = wl_state[0]

    zSST = T_s
    zdT_cs = 0.0
    if use_cs or use_wl:
        if use_cs:
            T_s = T_s - 0.25
        q_s = c.rdct_qsat_salt * q_sat(max(T_s, 200.0), slp)

    zlog_10 = math.log(10.0)
    zlog_zt = math.log(zt)
    zlog_zu = math.log(zu)

    zus, zts, zqs, t_zu, q_zu, zUbzu, zz0 = first_guess_coare_sc(
        zt, zu, T_s, t_zt, q_s, q_zt, U_zu, charn(U_zu))

    zlog_z0 = math.log(zz0)
    # version quirk: 3p0 evaluates viscosity at t_zt, 3p6 at first-guess t_zu
    znu_a = visc_air(t_zu) if visc_at_tzu else visc_air(t_zt)

    zdt = t_zu - T_s
    zdt = fsign(max(abs(zdt), 1.0e-9), zdt)
    zdq = q_zu - q_s
    zdq = fsign(max(abs(zdq), 1.0e-12), zdq)

    z1oL = zz0t = zlog_z0t = None
    for jit in range(1, niter + 1):
        zus2 = zus * zus

        z1oL = one_on_l(t_zu, q_zu, zus, zts, zqs)
        z1oL = fsign(min(abs(z1oL), 200.0), z1oL)

        zgust2 = (Beta0 * Beta0 * zus2
                  * max(-_ZI0_COARE * z1oL / c.vkarmn, 0.0) ** (2.0 / 3.0))
        if zgust2 > 0.0:
            HITS["coare_gust"] += 1
        zUbzu = max(math.sqrt(U_zu * U_zu + zgust2), 0.2)
        if zUbzu <= 0.2:
            HITS["coare_ub_floor"] += 1

        zzta_u = zu * z1oL
        if abs(zzta_u) >= _ZETA_ABS_MAX:
            HITS["coare_zeta_cap"] += 1
        zzta_u = fsign(min(abs(zzta_u), _ZETA_ABS_MAX), zzta_u)
        if not l_zt_equal_zu:
            zzta_t = zt * z1oL
            zzta_t = fsign(min(abs(zzta_t), _ZETA_ABS_MAX), zzta_t)
        elif version == "coare3p0":
            # 3p0 computes zzta_t unconditionally (mod_blk_coare3p0.f90:262)
            zzta_t = fsign(min(abs(zt * z1oL), _ZETA_ABS_MAX), zt * z1oL)

        zUn10 = zus / c.vkarmn * (zlog_10 - zlog_z0)
        zz0 = charn(zUn10) * zus2 / c.grav + 0.11 * znu_a / zus
        zz0 = min(max(abs(zz0), 1.0e-9), 1.0)
        zlog_z0 = math.log(zz0)

        ztmp1 = (znu_a / (zz0 * zus)) ** z0t_pow
        if z0t_coef * ztmp1 > z0t_max:
            HITS["coare_z0t_cap"] += 1
        zz0t = min(z0t_max, z0t_coef * ztmp1)
        zz0t = min(max(abs(zz0t), 1.0e-9), 1.0)
        zlog_z0t = math.log(zz0t)

        ztmp0 = psi_h_coare_sc(zzta_u)
        ztmp1 = c.vkarmn / (zlog_zu - zlog_z0t - ztmp0)
        zts = zdt * ztmp1
        zqs = zdq * ztmp1
        zus = max(zUbzu * c.vkarmn
                  / (zlog_zu - zlog_z0 - psi_m_coare_sc(zzta_u)), 1.0e-9)

        if version == "coare3p6":
            if not l_zt_equal_zu:
                ztmp1 = (zlog_zt - zlog_zu + ztmp0
                         - psi_h_coare_sc(zzta_t))
                t_zu = t_zt - zts / c.vkarmn * ztmp1
                q_zu = q_zt - zqs / c.vkarmn * ztmp1
        else:
            # 3p0 applies the shift via the zm_ztzu multiplier
            ztmp1 = zlog_zt - zlog_zu + ztmp0 - psi_h_coare_sc(zzta_t)
            t_zu = t_zt - zm_ztzu * zts / c.vkarmn * ztmp1
            q_zu = q_zt - zm_ztzu * zqs / c.vkarmn * ztmp1

        if use_cs:
            zQns, _zTau, zQlat = update_qnsol_tau(
                zu, T_s, q_s, t_zu, q_zu, zus, zts, zqs, U_zu, zUbzu,
                slp, rad_lw)
            zdT_cs = cs_coare(Qsw, zQns, zus, zSST, zQlat)
            T_s = zSST + zdT_cs
            if use_wl:
                T_s = T_s + wl_state[0]
            q_s = c.rdct_qsat_salt * q_sat(max(T_s, 200.0), slp)

        if use_wl:
            zQns, zTau, _ = update_qnsol_tau(
                zu, T_s, q_s, t_zu, q_zu, zus, zts, zqs, U_zu, zUbzu,
                slp, rad_lw)
            iwait = niter % jit       # MOD(nb_iter, jit): 0 => commit
            if iwait == 0:
                HITS["wl_commit"] += 1
            wl_state = wl_coare(Qsw, zQns, zTau, zSST, lon, isecday_utc,
                                iwait, wl_state, rdt=rdt, gdept=gdept)
            T_s = zSST + wl_state[0]
            if use_cs:
                T_s = T_s + zdT_cs
            q_s = c.rdct_qsat_salt * q_sat(max(T_s, 200.0), slp)

        if use_cs or use_wl or not l_zt_equal_zu or version == "coare3p0":
            # (3p0 refreshes unconditionally, mod_blk_coare3p0.f90:321-322)
            zdt = t_zu - T_s
            zdt = fsign(max(abs(zdt), 1.0e-9), zdt)
            zdq = q_zu - q_s
            zdq = fsign(max(abs(zdq), 1.0e-12), zdq)

    ztmp0 = zus / zUbzu
    Cd = max(ztmp0 * ztmp0, c.Cx_min)
    Ch = max(ztmp0 * zts / zdt, c.Cx_min)
    Ce = max(ztmp0 * zqs / zdq, c.Cx_min)
    if ztmp0 * ztmp0 <= c.Cx_min:
        HITS["coare_cd_floor"] += 1

    ztmp0 = 1.0 / (zlog_zu - zlog_z0)
    CdN = max(c.vkarmn2 * ztmp0 * ztmp0, c.Cx_min)
    CxN = max(c.vkarmn2 * ztmp0 / (zlog_zu - zlog_z0t), c.Cx_min)

    out = dict(Cd=Cd, Ch=Ch, Ce=Ce, t_zu=t_zu, q_zu=q_zu, Ubzu=zUbzu,
               T_s=T_s, q_s=q_s, CdN=CdN, ChN=CxN, CeN=CxN, z0=zz0,
               u_star=zus, L=1.0 / z1oL,
               UN10=zus / c.vkarmn * (zlog_10 - zlog_z0),
               dT_cs=zdT_cs, dT_wl=wl_state[0])
    return out, wl_state


# ---------------------------------------------------------------------------
# TURB_ECMWF
# ---------------------------------------------------------------------------

_CHARN0_ECMWF = 0.018
_ZI0_ECMWF = 1000.0
_ALPHA_M, _ALPHA_H, _ALPHA_Q = 0.11, 0.40, 0.62


def turb_ecmwf_sc(zt, zu, T_s, t_zt, q_s, q_zt, U_zu, niter=5,
                  use_cs=False, use_wl=False, Qsw=None, rad_lw=None,
                  slp=None, wl_state=None, rdt=3600.0, gdept=1.0):
    """TURB_ECMWF (mod_blk_ecmwf.f90:63-383), one point.  ``wl_state`` is
    (dT_wl, Hz_wl); returns (out dict, new wl_state)."""
    zm_ztzu = 0.0 if abs(zu - zt) < 0.01 else 1.0

    if wl_state is None:
        wl_state = (0.0, 3.0)
    zdT_cs = 0.0

    zSST = T_s
    if use_cs or use_wl:
        if use_cs:
            T_s = T_s - 0.25
        q_s = c.rdct_qsat_salt * q_sat(max(T_s, 200.0), slp)

    zlog_10 = math.log(10.0)
    zlog_zu = math.log(zu)
    zlog_ztu = math.log(zt / zu)

    zus, zts, zqs, zt_zu, zq_zu, zUbzu, zz0 = first_guess_coare_sc(
        zt, zu, T_s, t_zt, q_s, q_zt, U_zu, _CHARN0_ECMWF)

    zlog_z0 = math.log(zz0)
    znu_a = visc_air(t_zt)    # ECMWF quirk: at t_zt (mod_blk_ecmwf.f90:238)

    zdt = zt_zu - T_s
    zdt = fsign(max(abs(zdt), 1.0e-9), zdt)
    zdq = zq_zu - q_s
    zdq = fsign(max(abs(zdq), 1.0e-12), zdq)

    z1oL = one_on_l(zt_zu, zq_zu, zus, zts, zqs)
    zzeta_u = zu * z1oL

    zz0t = 1.0 / (0.1 * math.exp(c.vkarmn
                                 / (0.00115
                                    / (c.vkarmn / (zlog_10 - zlog_z0)))))
    zz0t = min(max(abs(zz0t), 1.0e-9), 1.0)
    zlog_z0t = math.log(zz0t)

    zFm = (zlog_zu - zlog_z0 - psi_m_ecmwf_sc(zzeta_u)
           + psi_m_ecmwf_sc(zz0 * z1oL))
    zpsi_h_u = psi_h_ecmwf_sc(zzeta_u)
    zFh = (zlog_zu - zlog_z0t - zpsi_h_u
           + psi_h_ecmwf_sc(zz0t * z1oL))

    zz0q = zlog_z0q = zpsi_h_z0q = None
    for _jit in range(niter):
        zRib = ri_bulk(zu, T_s, zt_zu, q_s, zq_zu, zUbzu)
        if zRib > 0:
            HITS["ecmwf_stable"] += 1
        else:
            HITS["ecmwf_unstable"] += 1

        z1oL = zRib * zFm * zFm / zFh / zu
        if abs(z1oL) >= 200.0:
            HITS["ecmwf_ool_cap"] += 1
        z1oL = fsign(min(abs(z1oL), 200.0), z1oL)

        zzeta_u = zu * z1oL
        zpsi_m_u = psi_m_ecmwf_sc(zzeta_u)
        zpsi_h_u = psi_h_ecmwf_sc(zzeta_u)
        zzeta_t = zt * z1oL
        zpsi_h_t = psi_h_ecmwf_sc(zzeta_t)

        zFm = zlog_zu - zlog_z0 - zpsi_m_u + psi_m_ecmwf_sc(zz0 * z1oL)

        zus = zUbzu * c.vkarmn / zFm
        zus2 = zus * zus
        ztmp0 = znu_a / zus
        zz0 = min(abs(_ALPHA_M * ztmp0 + _CHARN0_ECMWF * zus2 / c.grav),
                  0.001)
        if _ALPHA_M * ztmp0 + _CHARN0_ECMWF * zus2 / c.grav >= 0.001:
            HITS["ecmwf_z0_cap"] += 1
        zz0t = min(abs(_ALPHA_H * ztmp0), 0.001)
        zz0q = min(abs(_ALPHA_Q * ztmp0), 0.001)
        zlog_z0 = math.log(zz0)
        zlog_z0t = math.log(zz0t)
        zlog_z0q = math.log(zz0q)

        zpsi_m_z0 = psi_m_ecmwf_sc(zz0 * z1oL)
        zpsi_h_z0t = psi_h_ecmwf_sc(zz0t * z1oL)
        zpsi_h_z0q = psi_h_ecmwf_sc(zz0q * z1oL)

        ztmp0 = (1.0 * 1.0 * zus2
                 * max(-_ZI0_ECMWF * z1oL / c.vkarmn, 0.0) ** (2.0 / 3.0))
        zUbzu = max(math.sqrt(U_zu * U_zu + ztmp0), 0.2)

        ztmp0 = zpsi_h_u - zpsi_h_z0t
        ztmp1 = c.vkarmn / (zlog_zu - zlog_z0t - ztmp0)
        zts = zdt * ztmp1
        ztmp1 = zlog_ztu + ztmp0 - zpsi_h_t + zpsi_h_z0t
        zt_zu = t_zt - zm_ztzu * zts / c.vkarmn * ztmp1

        ztmp0 = zpsi_h_u - zpsi_h_z0q
        ztmp1 = c.vkarmn / (zlog_zu - zlog_z0q - ztmp0)
        zqs = zdq * ztmp1
        ztmp1 = zlog_ztu + ztmp0 - zpsi_h_t + zpsi_h_z0q
        zq_zu = max(q_zt - zm_ztzu * zqs / c.vkarmn * ztmp1, 0.0)

        zFm = zlog_zu - zlog_z0 - zpsi_m_u + zpsi_m_z0
        zFh = zlog_zu - zlog_z0t - zpsi_h_u + zpsi_h_z0t

        if use_cs:
            zQns, _zTau, _ = update_qnsol_tau(
                zu, T_s, q_s, zt_zu, zq_zu, zus, zts, zqs, U_zu, zUbzu,
                slp, rad_lw)
            zdT_cs = cs_ecmwf(Qsw, zQns, zus, zSST)
            T_s = zSST + zdT_cs
            if use_wl:
                T_s = T_s + wl_state[0]
            q_s = c.rdct_qsat_salt * q_sat(max(T_s, 200.0), slp)

        if use_wl:
            zQns, _zTau, _ = update_qnsol_tau(
                zu, T_s, q_s, zt_zu, zq_zu, zus, zts, zqs, U_zu, zUbzu,
                slp, rad_lw)
            new_dT = wl_ecmwf(Qsw, zQns, zus, zSST, wl_state[0],
                              wl_state[1], rdt=rdt, gdept=gdept)
            wl_state = (new_dT, wl_state[1])
            T_s = zSST + wl_state[0]
            if use_cs:
                T_s = T_s + zdT_cs
            q_s = c.rdct_qsat_salt * q_sat(max(T_s, 200.0), slp)

        zdt = zt_zu - T_s
        zdt = fsign(max(abs(zdt), 1.0e-9), zdt)
        zdq = zq_zu - q_s
        zdq = fsign(max(abs(zdq), 1.0e-12), zdq)

    zFq = zlog_zu - zlog_z0q - zpsi_h_u + zpsi_h_z0q
    Cd = max(c.vkarmn2 / (zFm * zFm), c.Cx_min)
    Ch = max(c.vkarmn2 / (zFm * zFh), c.Cx_min)
    Ce = max(c.vkarmn2 / (zFm * zFq), c.Cx_min)

    ztmp0 = 1.0 / (zlog_zu - zlog_z0)
    CdN = max(c.vkarmn2 * ztmp0 * ztmp0, c.Cx_min)
    CxN = max(c.vkarmn2 * ztmp0 / (zlog_zu - zlog_z0t), c.Cx_min)

    out = dict(Cd=Cd, Ch=Ch, Ce=Ce, t_zu=zt_zu, q_zu=zq_zu, Ubzu=zUbzu,
               T_s=T_s, q_s=q_s, CdN=CdN, ChN=CxN, CeN=CxN, z0=zz0,
               u_star=zus, L=1.0 / z1oL,
               UN10=zus / c.vkarmn * (zlog_10 - zlog_z0),
               dT_cs=zdT_cs, dT_wl=wl_state[0])
    return out, wl_state


# ---------------------------------------------------------------------------
# TURB_NCAR
# ---------------------------------------------------------------------------

def cd_n10_ncar_sc(w10):
    """mod_blk_ncar.f90:244-271"""
    zw = w10
    zw6 = zw * zw * zw
    zw6 = zw6 * zw6
    zgt33 = 0.5 + fsign(0.5, zw - 33.0)
    if zgt33 > 0.5:
        HITS["ncar_cyclone"] += 1
    v = 1.0e-3 * ((1.0 - zgt33) * (2.7 / zw + 0.142 + zw / 13.09
                                   - 3.14807e-10 * zw6)
                  + zgt33 * 2.34)
    return max(v, c.Cx_min)


def turb_ncar_sc(zt, zu, sst, t_zt, ssq, q_zt, U_zu, niter=5):
    """TURB_NCAR (mod_blk_ncar.f90:57-240), one point."""
    l_zt_equal_zu = abs(zu - zt) < 0.01
    zlog1 = math.log(zt / zu)
    zlog2 = math.log(zu / 10.0)

    Ubzu = max(0.5, U_zu)
    if U_zu <= 0.5:
        HITS["ncar_wind_floor"] += 1

    zstab = 0.5 + fsign(0.5, virt_temp(t_zt, q_zt) - virt_temp(sst, ssq))

    zCdN = cd_n10_ncar_sc(Ubzu)
    zsqrt_CdN = math.sqrt(zCdN)
    Cd = zCdN
    Ce = max(1.0e-3 * (34.6 * zsqrt_CdN), c.Cx_min)
    Ch = max(1.0e-3 * zsqrt_CdN * (18.0 * zstab + 32.7 * (1.0 - zstab)),
             c.Cx_min)
    zsqrt_Cd = zsqrt_CdN

    t_zu = max(t_zt, 180.0)
    q_zu = max(q_zt, 1.0e-6)

    zChN = zCeN = zUn10 = z1oL = zus = None
    for _ in range(niter):
        zdt = t_zu - sst
        zdq = q_zu - ssq

        zus = zsqrt_Cd * Ubzu
        zts = Ch / zsqrt_Cd * zdt
        zqs = Ce / zsqrt_Cd * zdq

        z1oL = one_on_l(t_zu, q_zu, zus, zts, zqs)

        zeta_u = zu * z1oL
        if abs(zeta_u) >= 10.0:
            HITS["ncar_zeta_cap"] += 1
        zeta_u = fsign(min(abs(zeta_u), 10.0), zeta_u)

        if not l_zt_equal_zu:
            zeta_t = zt * z1oL
            zeta_t = fsign(min(abs(zeta_t), 10.0), zeta_t)
            ztmp = zlog1 + psi_h_ncar_sc(zeta_u) - psi_h_ncar_sc(zeta_t)
            t_zu = t_zt - zts / c.vkarmn * ztmp
            q_zu = q_zt - zqs / c.vkarmn * ztmp
            if q_zu < 0.0:
                HITS["ncar_qzu_clip"] += 1
            q_zu = max(0.0, q_zu)

        zpsi_m = psi_m_ncar_sc(zeta_u)
        zUn10 = max(0.25, un10_from_cd(zu, Ubzu, Cd, zpsi_m))
        if un10_from_cd(zu, Ubzu, Cd, zpsi_m) <= 0.25:
            HITS["ncar_un10_floor"] += 1
        zCdN = cd_n10_ncar_sc(zUn10)
        zsqrt_CdN = math.sqrt(zCdN)

        ztmp = 1.0 + zsqrt_CdN / c.vkarmn * (zlog2 - zpsi_m)
        Cd = max(zCdN / (ztmp * ztmp), c.Cx_min)
        zsqrt_Cd = math.sqrt(Cd)
        ztmp = (zlog2 - psi_h_ncar_sc(zeta_u)) / c.vkarmn / zsqrt_CdN
        ztmp2 = zsqrt_Cd / zsqrt_CdN

        zstab = 0.5 + fsign(0.5, zeta_u)
        zChN = 1.0e-3 * zsqrt_CdN * (18.0 * zstab + 32.7 * (1.0 - zstab))
        zCeN = 1.0e-3 * (34.6 * zsqrt_CdN)

        Ch = max(zChN * ztmp2 / (1.0 + zChN * ztmp), c.Cx_min)
        Ce = max(zCeN * ztmp2 / (1.0 + zCeN * ztmp), c.Cx_min)

    return dict(Cd=Cd, Ch=Ch, Ce=Ce, t_zu=t_zu, q_zu=q_zu, Ubzu=Ubzu,
                T_s=sst, q_s=ssq, CdN=zCdN, ChN=zChN, CeN=zCeN,
                z0=min(z0_from_cd(zu, zCdN), c.z0_sea_max),
                u_star=zus, L=1.0 / z1oL, UN10=zUn10)


# ---------------------------------------------------------------------------
# TURB_ANDREAS
# ---------------------------------------------------------------------------

_RRI_MAX = 0.15
_RCS_MIN = 0.35e-3


def u_star_andreas_sc(un10):
    """mod_blk_andreas.f90:275-293"""
    za = un10 - 8.271
    zt_ = za + math.sqrt(0.12 * za * za + 0.181)
    return 0.239 + 0.0433 * zt_


def turb_andreas_sc(zt, zu, psst, t_zt, pssq, q_zt, U_zu, niter=5):
    """TURB_ANDREAS (mod_blk_andreas.f90:66-272), one point."""
    l_zt_equal_zu = abs(zu - zt) < 0.01

    pUbzu = max(0.25, U_zu)
    if U_zu <= 0.25:
        HITS["andreas_wind_floor"] += 1

    UN10 = pUbzu
    pCd = 1.1e-3
    pCh = 1.1e-3
    pCe = 1.1e-3
    pt_zu = t_zt
    pq_zu = q_zt

    ztmp0 = math.sqrt(pCd)
    t_star = pCh / ztmp0 * (pt_zu - psst)
    q_star = pCe / ztmp0 * (pq_zu - pssq)

    RiB = ri_bulk(zu, psst, pt_zu, pssq, pq_zu, pUbzu)

    u_star = zeta_u = z0 = None
    for jit in range(1, niter + 1):
        if RiB < _RRI_MAX:
            u_star = u_star_andreas_sc(UN10)
        else:
            HITS["andreas_ri_guard"] += 1
            u_star = math.sqrt(c.Cx_min) * pUbzu

        zeta_u = zu * one_on_l(pt_zu, pq_zu, u_star, t_star, q_star)

        ztmp0 = u_star / pUbzu
        pCd = max(ztmp0 * ztmp0, c.Cx_min)

        z0 = min(z0_from_cd(zu, pCd, psi=psi_m_andreas_sc(zeta_u)),
                 c.z0_sea_max)
        if z0 >= c.z0_sea_max:
            HITS["andreas_z0_cap"] += 1

        ztmp0 = z0 * u_star / visc_air(pt_zu)
        ztmp1 = z0tq_lkb(1, ztmp0, z0)
        ztmp2 = z0tq_lkb(2, ztmp0, z0)

        ztmp0 = psi_h_andreas_sc(zeta_u)
        t_star = ((pt_zu - psst) * c.vkarmn
                  / (math.log(zu) - math.log(ztmp1) - ztmp0))
        q_star = ((pq_zu - pssq) * c.vkarmn
                  / (math.log(zu) - math.log(ztmp2) - ztmp0))

        if (not l_zt_equal_zu) and jit > 1:
            ztmp0 = zeta_u / zu * zt
            ztmp0 = (math.log(zt / zu) + psi_h_andreas_sc(zeta_u)
                     - psi_h_andreas_sc(ztmp0))
            pt_zu = t_zt - t_star / c.vkarmn * ztmp0
            pq_zu = q_zt - q_star / c.vkarmn * ztmp0
            RiB = ri_bulk(zu, psst, pt_zu, pssq, pq_zu, pUbzu)

        UN10 = max(0.1, un10_from_ustar(zu, pUbzu, u_star,
                                        psi_m_andreas_sc(zeta_u)))

    ztmp0 = u_star / pUbzu
    pCd = max(ztmp0 * ztmp0, c.Cx_min)

    ztmp1 = pt_zu - psst
    ztmp1 = fsign(max(abs(ztmp1), 1.0e-6), ztmp1)
    ztmp2 = pq_zu - pssq
    ztmp2 = fsign(max(abs(ztmp2), 1.0e-9), ztmp2)
    pCh = max(ztmp0 * t_star / ztmp1, _RCS_MIN)
    pCe = max(ztmp0 * q_star / ztmp2, _RCS_MIN)
    if ztmp0 * t_star / ztmp1 <= _RCS_MIN:
        HITS["andreas_cs_floor"] += 1

    ztmp0 = 1.0 / math.log(zu / z0)
    CdN = max(c.vkarmn2 * ztmp0 * ztmp0, c.Cx_min)
    ztmp1 = z0 * u_star / visc_air(pt_zu)
    ChN = c.vkarmn2 * ztmp0 / math.log(zu / z0tq_lkb(1, ztmp1, z0))
    CeN = c.vkarmn2 * ztmp0 / math.log(zu / z0tq_lkb(2, ztmp1, z0))

    return dict(Cd=pCd, Ch=pCh, Ce=pCe, t_zu=pt_zu, q_zu=pq_zu, Ubzu=pUbzu,
                T_s=psst, q_s=pssq, CdN=CdN, ChN=ChN, CeN=CeN, z0=z0,
                u_star=u_star, L=zu / zeta_u,
                UN10=un10_from_ustar(zu, pUbzu, u_star,
                                     psi_m_andreas_sc(zeta_u)))


# ---------------------------------------------------------------------------
# TURB_NEUTRAL_10M
# ---------------------------------------------------------------------------

_RNU0_AIR = 1.5e-5


def turb_neutral_10m_sc(calgo, U_N10, niter=5):
    """TURB_NEUTRAL_10M (mod_blk_neutral_10m.f90:33-209), one point.
    Returns (CdN10, ChN10, CeN10, z0).  The reference's 'andreas' branch
    STOPs ('YET TO BE CODED'); the rebuild implements it from the
    u*(UN10) closure + LKB — transcribed here from that documented
    extension so it stays pinned."""
    if calgo in ("coare3p0", "coare3p6", "ecmwf"):
        Ub = max(U_N10, 0.1)
        CdN10 = 8.575e-5 * Ub + 0.657e-3
        for _ in range(niter):
            us = Ub * math.sqrt(CdN10)
            if calgo == "coare3p6":
                ch = charn_coare3p6_sc(Ub)
            elif calgo == "coare3p0":
                ch = charn_coare3p0_sc(Ub)
            else:
                ch = _CHARN0_ECMWF
            z0 = ch * us * us / c.grav + 0.11 * _RNU0_AIR / us
            lg = math.log(10.0 / z0)
            CdN10 = c.vkarmn2 / (lg * lg)
        if calgo == "coare3p0":
            rer = z0 * us / _RNU0_AIR
            z0t = min(1.1e-4, 5.5e-5 * rer ** (-0.6))
            z0q = z0t
        elif calgo == "coare3p6":
            rer = z0 * us / _RNU0_AIR
            z0t = min(1.6e-4, 5.8e-5 * rer ** (-0.72))
            z0q = z0t
        else:
            z0t = 0.40 * _RNU0_AIR / us
            z0q = 0.62 * _RNU0_AIR / us
        ChN10 = c.vkarmn2 / (lg * math.log(10.0 / z0t))
        CeN10 = c.vkarmn2 / (lg * math.log(10.0 / z0q))
        return CdN10, ChN10, CeN10, z0

    if calgo == "ncar":
        from .turb import cd_n10_ncar_sc
        Ub = max(U_N10, 0.5)
        CdN10 = cd_n10_ncar_sc(Ub)
        s = math.sqrt(CdN10)
        ChN10 = max(1.0e-3 * s * (18.0 * 0.0 + 32.7 * 1.0), c.Cx_min)
        CeN10 = max(1.0e-3 * (34.6 * s), c.Cx_min)
        z0 = min(max(z0_from_cd(10.0, CdN10), 0.0001), 0.1)
        return CdN10, ChN10, CeN10, z0

    if calgo == "andreas":
        Ub = max(U_N10, 0.5)
        us = u_star_andreas_sc(Ub)
        r = us / Ub
        CdN10 = r * r
        z0 = z0_from_cd(10.0, CdN10)
        rer = z0 * us / _RNU0_AIR
        z0t = z0tq_lkb(1, rer, z0)
        z0q = z0tq_lkb(2, rer, z0)
        lg = math.log(10.0 / z0)
        ChN10 = c.vkarmn2 / (lg * math.log(10.0 / z0t))
        CeN10 = c.vkarmn2 / (lg * math.log(10.0 / z0q))
        return CdN10, ChN10, CeN10, z0

    raise ValueError(calgo)


# ---------------------------------------------------------------------------
# psi_m/h_grachev07 (mod_blk_grachev07.f90:49-127)
# ---------------------------------------------------------------------------

def psi_m_grachev07_sc(zeta):
    """mod_blk_grachev07.f90:49-71.  The stable expression is only
    evaluated when selected (Fortran MERGE evaluates both operands but
    the (1+zeta)**1/3 NaN for zeta < -1 is discarded; here we guard to
    keep the scalar arithmetic warning-free)."""
    if zeta < 0.0:
        zx = abs(1.0 - 16.0 * zeta) ** 0.25
        return (math.log(0.5 * (1.0 + zx * zx))
                + 2.0 * math.log(0.5 * (1.0 + zx))
                - 2.0 * math.atan(zx) + 0.5 * RPI)
    return -(1.0 + 6.5 * zeta * (1.0 + zeta) ** 0.3333333 / (1.3 + zeta))


def psi_h_grachev07_sc(zeta):
    """mod_blk_grachev07.f90:91-115"""
    if zeta < 0.0:
        zx = abs(1.0 - 16.0 * zeta) ** 0.25
        return 2.0 * math.log(0.5 * (1.0 + zx * zx))
    return -(1.0 + 5.0 * zeta * (1.0 + zeta)
             / (1.0 + 3.0 * zeta + zeta * zeta))
