/*
 * CPU baseline for bench.py's headline metric: single-core throughput of
 * the reference's COARE3.6 + cool-skin/warm-layer flux step, in C.
 *
 * This is a faithful transcription of the per-point arithmetic of the
 * reference Fortran (the hot loop at mod_blk_coare3p6.f90:302-383 plus
 * everything aerobulk_compute does around it: humidity saturation,
 * theta conversion, FIRST_GUESS_COARE, CS_COARE, WL_COARE, BULK_FORMULA)
 * compiled with the same optimization level the reference uses
 * (-O3, arch/make.macro_GnuLinux:17).  gfortran is absent from this
 * image, so a C port of the same scalar math is the closest measurable
 * stand-in; C and Fortran compile to near-identical scalar fp64 code
 * here (libm-bound transcendental chain, no vectorizable structure
 * without -ffast-math, which the reference does not use).
 *
 * Build & run:
 *   cc -O3 -o coare36_skin_baseline coare36_skin_baseline.c -lm
 *   ./coare36_skin_baseline [npoints] [nsteps]
 *
 * Prints one JSON line: {"metric": "cpu_baseline_coare3p6_skin", ...}
 */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

/* ---- constants (mod_const.f90) ---- */
static const double grav = 9.8, vkarmn = 0.4, vkarmn2 = 0.16;
static const double rt0 = 273.15;
static const double R_dry = 287.05, R_vap = 461.495;
static const double rCp_dry = 1005.0, rCp_vap = 1860.0;
static const double emiss_w = 0.98, stefan = 5.67e-8;
static const double rho0_w = 1025.0, rCp0_w = 4190.0, rnu0_w = 1.0e-6;
static const double rk0_w = 0.6, rLevap = 2.46e6;
static const double rdct_qsat_salt = 0.98;
static const double Cx_min = 0.1e-3;
static const double roce_alb0 = 0.066;
static const double Hwl_max = 20.0, Rich0 = 0.65;
static const double rdt = 3600.0, gdept = 1.0;
#define REPS0 (287.05 / 461.495)
#define RCTV0 (461.495 / 287.05 - 1.0)
#define RGAMMA_DRY (9.8 / 1005.0)
#define SQ_RADRW sqrt(1.2 / 1025.0)
#define RCST_CS (-16.0 * 9.80665 * 1025.0 * 4190.0 * 1e-18 / (0.6 * 0.6))

static inline double fsign(double a, double b) { return copysign(fabs(a), b); }
static inline double dmin(double a, double b) { return a < b ? a : b; }
static inline double dmax(double a, double b) { return a > b ? a : b; }

/* ---- mod_phymbl scalar functions ---- */
static inline double visc_air(double Ta) {
    double tc = Ta - rt0, tc2 = tc * tc;
    return 1.326e-5 * (1.0 + 6.542e-3 * tc + 8.301e-6 * tc2
                       - 4.84e-9 * tc2 * tc);
}
static inline double rho_air(double Ta, double qa, double slp) {
    return dmax(slp / (R_dry * Ta * (1.0 + RCTV0 * qa)), 0.8);
}
static inline double L_vap(double sst) {
    return (2.501 - 0.00237 * (sst - rt0)) * 1.0e6;
}
static inline double cp_air(double qa) { return rCp_dry + rCp_vap * qa; }
static inline double e_sat(double Ta) {           /* Goff 1957 */
    double zta = dmax(Ta, 180.0), ztmp = rt0 / zta;
    return 100.0 * pow(10.0,
        10.79574 * (1.0 - ztmp) - 5.028 * log10(zta / rt0)
        + 1.50475e-4 * (1.0 - pow(10.0, -8.2969 * (zta / rt0 - 1.0)))
        + 0.42873e-3 * (pow(10.0, 4.76955 * (1.0 - ztmp)) - 1.0)
        + 0.78614);
}
static inline double q_sat(double Ta, double slp) {
    double es = e_sat(Ta);
    return REPS0 * es / (slp - (1.0 - REPS0) * es);
}
static inline double virt_temp(double Ta, double qa) {
    return Ta * (1.0 + RCTV0 * qa);
}
static inline double one_on_l(double th, double qa, double us, double ts,
                              double qs) {
    double zqa = 1.0 + RCTV0 * qa;
    double o = grav * vkarmn * (ts * zqa + RCTV0 * th * qs)
        / dmax(us * us * th * zqa, 1.0e-9);
    return fsign(dmin(fabs(o), 200.0), o);
}
static inline double ri_bulk(double z, double sst, double th, double ssq,
                             double qa, double ub) {
    double sstv = virt_temp(sst, ssq);
    double dthv = virt_temp(th, qa) - sstv;
    double tv = 0.5 * (sstv + virt_temp(th - RGAMMA_DRY * z, qa));
    return grav * dthv * z / (tv * ub * ub);
}
static inline double qlw_net(double dwlw, double ts) {
    double t2 = ts * ts;
    return emiss_w * (dwlw - stefan * t2 * t2);
}
static inline double alpha_sw(double sst) {
    return 2.1e-5 * pow(dmax(sst - rt0 + 3.2, 0.0), 0.79);
}
static inline double theta_from_z_p0_t_q(double z, double slp, double Ta,
                                         double qa) {
    /* Pz_from_P0_tz_qz 3-iteration + pot_temp (mod_phymbl.f90:283-375) */
    const double R_gas = 8.314510, mm_dry = 28.9647e-3, mm_w = 18.0153e-3;
    double pa = slp;
    for (int i = 0; i < 3; i++) {
        double f = qa / q_sat(Ta, pa);
        double xm = (1.0 - f) * mm_dry + f * mm_w;
        pa = slp * exp(-grav * xm * z / (R_gas * Ta));
    }
    return Ta * pow(slp / pa, R_dry / rCp_dry);
}

/* ---- psi COARE (mod_common_coare.f90:217-392) ---- */
static inline double psi_m_coare(double z) {
    double pm = pow(fabs(1.0 - 15.0 * z), 0.25);
    double pk = 2.0 * log((1.0 + pm) / 2.0) + log((1.0 + pm * pm) / 2.0)
        - 2.0 * atan(pm) + 0.5 * M_PI;
    double pc_ = pow(fabs(1.0 - 10.15 * z), 0.3333);
    double pcc = 1.5 * log((1.0 + pc_ + pc_ * pc_) / 3.0)
        - 1.7320508 * atan((1.0 + 2.0 * pc_) / 1.7320508) + 1.813799447;
    double f = z * z; f = f / (1.0 + f);
    double cc = dmin(50.0, 0.35 * z);
    double st = 0.5 + fsign(0.5, z);
    return (1.0 - st) * ((1.0 - f) * pk + f * pcc)
        - st * (1.0 + z + 0.6667 * (z - 14.28) / exp(cc) + 8.525);
}
static inline double psi_h_coare(double z) {
    double ph = pow(fabs(1.0 - 15.0 * z), 0.5);
    double pk = 2.0 * log((1.0 + ph) / 2.0);
    double pc_ = pow(fabs(1.0 - 34.15 * z), 0.3333);
    double pcc = 1.5 * log((1.0 + pc_ + pc_ * pc_) / 3.0)
        - 1.7320508 * atan((1.0 + 2.0 * pc_) / 1.7320508) + 1.813799447;
    double f = z * z; f = f / (1.0 + f);
    double cc = dmin(50.0, 0.35 * z);
    double st = 0.5 + fsign(0.5, z);
    return (1.0 - st) * ((1.0 - f) * pk + f * pcc)
        - st * (pow(fabs(1.0 + 2.0 * z / 3.0), 1.5)
                + 0.6667 * (z - 14.28) / exp(cc) + 8.525);
}
static inline double charn36(double w) {
    return dmax(dmin(0.0017 * w - 0.005, 0.028), 0.0);
}

/* ---- BULK_FORMULA / UPDATE_QNSOL_TAU (mod_phymbl.f90:1059-1203) ---- */
static void bulk_formula(double zu, double ts, double qs, double th,
                         double qa, double Cd, double Ch, double Ce,
                         double wnd, double Ub, double slp,
                         double *Tau, double *Qsen, double *Qlat,
                         double *Evap, double *rhoa) {
    double zta = th - RGAMMA_DRY * zu;
    double zrho = rho_air(zta, qa, slp);
    zrho = rho_air(zta, qa, slp - zrho * grav * zu);
    double zUrho = Ub * dmax(zrho, 1.0);
    *Tau = zUrho * Cd * wnd;
    double zevap = zUrho * Ce * (qa - qs);
    *Qsen = zUrho * Ch * (th - ts) * cp_air(qa);
    *Qlat = L_vap(ts) * zevap;
    if (Evap) *Evap = zevap;
    if (rhoa) *rhoa = zrho;
}
static void update_qnsol_tau(double zu, double ts, double qs, double th,
                             double qa, double ust, double tst, double qst,
                             double wnd, double Ub, double slp, double rlw,
                             double *Qns, double *Tau, double *Qlat) {
    double zdt = th - ts; zdt = fsign(dmax(fabs(zdt), 1e-9), zdt);
    double zdq = qa - qs; zdq = fsign(dmax(fabs(zdq), 1e-12), zdq);
    double z0 = ust / Ub;
    double Cd = z0 * z0, Ch = z0 * tst / zdt, Ce = z0 * qst / zdq;
    double qs_, ql_;
    bulk_formula(zu, ts, qs, th, qa, Cd, Ch, Ce, wnd, Ub, slp,
                 Tau, &qs_, &ql_, NULL, NULL);
    *Qns = ql_ + qs_ + qlw_net(rlw, ts);
    if (Qlat) *Qlat = ql_;
}

/* ---- CS_COARE (mod_skin_coare.f90:48-93) ---- */
static inline double delta_skin_layer(double alpha, double Qd, double usta,
                                      double Qlat) {
    double zQd = Qd + 0.026 * dmin(Qlat, 0.0) * rCp0_w / rLevap / alpha;
    double ztf = 0.5 + fsign(0.5, zQd);
    double zusw = dmax(usta, 1e-4) * SQ_RADRW;
    double zusw2 = zusw * zusw;
    double zlamb = 6.0 * pow(1.0 + pow(dmax(alpha * RCST_CS
                                            / (zusw2 * zusw2) * zQd, 0.0),
                                       0.75), -1.0 / 3.0);
    double ztmp = rnu0_w / zusw;
    return (1.0 - ztf) * zlamb * ztmp + ztf * dmin(6.0 * ztmp, 0.007);
}
static double cs_coare(double Qsw, double Qnsol, double ustar, double sst,
                       double Qlat) {
    double al = alpha_sw(sst);
    double zQabs = Qnsol;
    double zdelta = delta_skin_layer(al, zQabs, ustar, Qlat);
    for (int jc = 0; jc < 4; jc++) {
        double zfr = dmax(0.137 + 11.0 * zdelta
                          - 6.6e-5 / zdelta * (1.0 - exp(-zdelta / 8e-4)),
                          0.01);
        zQabs = Qnsol + zfr * Qsw;
        zdelta = delta_skin_layer(al, zQabs, ustar, Qlat);
    }
    return zQabs * zdelta / rk0_w;
}

/* ---- WL_COARE (mod_skin_coare.f90:97-250) ---- */
typedef struct { double dT_wl, Hz_wl, Qnt_ac, Tau_ac; } wl_state;

static void wl_coare(double Qsw, double Qnsol, double Tau, double sst,
                     double lon, int isd, int iwait, wl_state *st) {
    int l_exit = 0, l_destroy = 0;
    double zdT = st->dT_wl;
    double zH = dmax(dmin(st->Hz_wl, Hwl_max), 0.1);
    double zqac = st->Qnt_ac, ztac = st->Tau_ac, zQabs = 0.0, zfr;

    /* Fortran MODULO is floor-mod; C fmod keeps the dividend's sign */
    double m1 = fmod((360.0 - fmod(lon + 360000.0, 360.0)) / 15.0, 24.0);
    if (m1 < 0) m1 += 24.0;
    double rlag = -m1;
    double m2 = fmod(rlag, 24.0); if (m2 < 0) m2 += 24.0;
    rlag = -fsign(dmin(fabs(rlag), fabs(m2)), rlag + 12.0);
    int ilag = (int)(rlag * 3600.0);
    int isd_sol = (isd + ilag) % 86400; if (isd_sol < 0) isd_sol += 86400;
    double rhr = (double)isd_sol / 3600.0;

    double al = alpha_sw(sst);
    double cd1 = sqrt(2.0 * Rich0 * rCp0_w / (al * grav * rho0_w));
    double cd2 = sqrt(2.0 * al * grav / (Rich0 * rho0_w))
        / pow(rCp0_w, 1.5);

    if (rhr > 4.0 && rhr <= 6.5) { l_exit = 1; l_destroy = 1; }
    if (!l_exit) {
        zfr = 1.0 - (0.28 * 0.014 * (1.0 - exp(-zH / 0.014))
                     + 0.27 * 0.357 * (1.0 - exp(-zH / 0.357))
                     + 0.45 * 12.82 * (1.0 - exp(-zH / 12.82))) / zH;
        zQabs = zfr * Qsw + Qnsol;
        if (fabs(zdT) < 1e-6 && zQabs <= 0.0) l_exit = 1;
    }
    if (!l_exit && st->Qnt_ac + zQabs * rdt <= 0.0) {
        l_exit = 1; l_destroy = 1;
    }
    if (!l_exit) {
        ztac = st->Tau_ac + dmax(0.002, Tau) * rdt;
        for (int jl = 0; jl < 5; jl++) {
            zfr = 1.0 - (0.28 * 0.014 * (1.0 - exp(-zH / 0.014))
                         + 0.27 * 0.357 * (1.0 - exp(-zH / 0.357))
                         + 0.45 * 12.82 * (1.0 - exp(-zH / 12.82))) / zH;
            zQabs = zfr * Qsw + Qnsol;
            zqac = st->Qnt_ac + zQabs * rdt;
            if (zqac <= 0.0) break;
            zH = dmax(dmin(Hwl_max, cd1 * ztac / sqrt(zqac)), 0.1);
        }
        if (zqac <= 0.0) { l_destroy = 1; l_exit = 1; }
        else {
            zdT = cd2 * pow(zqac, 1.5) / ztac * dmax(zqac / fabs(zqac), 0.0);
            double flg = 0.5 + fsign(0.5, gdept - zH);
            zdT = zdT * (flg + (1.0 - flg) * gdept / zH);
        }
    }
    if (l_destroy) { zdT = 0.0; zH = Hwl_max; zqac = 0.0; ztac = 0.0; }
    if (iwait == 0) {
        st->dT_wl = zdT; st->Hz_wl = zH; st->Qnt_ac = zqac; st->Tau_ac = ztac;
    }
}

/* ---- FIRST_GUESS_COARE (mod_common_coare.f90:33-179) ---- */
static void first_guess(double zt, double zu, double sst, double t_zt,
                        double ssq, double q_zt, double U_zu, double charn,
                        double *us_, double *ts_, double *qs_, double *tzu_,
                        double *qzu_, double *Ub_, double *z0_) {
    double t_zu = dmax(t_zt, 180.0), q_zu = dmax(q_zt, 1e-6);
    double zz0 = 1e-4;
    double l10 = log(10.0), lzt = log(zt), lzu = log(zu);
    double c_a = 0.035 * log(10.0 / zz0) / log(zu / zz0);
    double c_b = 0.004 * 600.0 * 1.2 * 1.2 * 1.2;
    double zdt = t_zu - sst; zdt = fsign(dmax(fabs(zdt), 1e-9), zdt);
    double zdq = q_zu - ssq; zdq = fsign(dmax(fabs(zdq), 1e-12), zdq);
    double nua = visc_air(t_zu);
    double Ub = sqrt(U_zu * U_zu + 0.25);
    double us = c_a * Ub;
    zz0 = charn * us * us / grav + 0.11 * nua / us;
    zz0 = dmin(dmax(fabs(zz0), 1e-8), 1.0);
    double lz0 = log(zz0);
    double Cd = (vkarmn / (lzu - lz0)) * (vkarmn / (lzu - lz0));
    double i_sq10 = (l10 - lz0) / vkarmn;
    double zz0t = 10.0 / exp(vkarmn / (0.00115 * i_sq10));
    zz0t = dmin(dmax(fabs(zz0t), 1e-8), 1.0);
    double lz0t = log(zz0t);
    double Rib = ri_bulk(zu, sst, t_zu, ssq, q_zu, Ub);
    double cc = vkarmn2 / (Cd * (lzt - lz0t));
    double ccri = cc * Rib;
    double i_ribcu = -c_b / zu;
    double stab = 0.5 + fsign(0.5, Rib);
    double zeta_u = (1.0 - stab) * ccri / (1.0 + Rib * i_ribcu)
        + stab * (ccri + 3.0 * Rib * Rib);
    us = dmax(Ub * vkarmn / (lzu - lz0 - psi_m_coare(zeta_u)), 1e-9);
    double ztmp = vkarmn / (lzu - lz0t - psi_h_coare(zeta_u));
    double ts = zdt * ztmp, qs = zdq * ztmp;
    if (fabs(zu - zt) >= 0.01) {
        double zeta_t = zt * zeta_u / zu;
        double prf = log(zt / zu) + psi_h_coare(zeta_u)
            - psi_h_coare(zeta_t);
        t_zu = t_zt - ts / vkarmn * prf;
        q_zu = q_zt - qs / vkarmn * prf;
        q_zu = (0.5 + fsign(0.5, q_zu)) * q_zu;
        zdt = t_zu - sst; zdt = fsign(dmax(fabs(zdt), 1e-9), zdt);
        zdq = q_zu - ssq; zdq = fsign(dmax(fabs(zdq), 1e-12), zdq);
        ts = zdt * ztmp; qs = zdq * ztmp;
    }
    zz0 = charn * us * us / grav + 0.11 * nua / us;
    *z0_ = dmin(dmax(fabs(zz0), 1e-8), 1.0);
    *us_ = us; *ts_ = ts; *qs_ = qs; *tzu_ = t_zu; *qzu_ = q_zu; *Ub_ = Ub;
}

/* ---- the full flux step: one point, COARE3.6 + CS + WL + BULK ---- */
static double flux_step_point(double zt, double zu, double sst,
                              double t_abs_zt, double q_zt, double U,
                              double V, double slp, double rsw, double rlw,
                              double lon, int isecday, int niter,
                              wl_state *st) {
    double wnd = sqrt(U * U + V * V);
    double ssq = rdct_qsat_salt * q_sat(sst, slp);
    double theta = theta_from_z_p0_t_q(zt, slp, t_abs_zt, q_zt);
    double Qsw = (1.0 - roce_alb0) * rsw;

    double T_s = sst - 0.25;    /* cool-skin first guess */
    double q_s = rdct_qsat_salt * q_sat(dmax(T_s, 200.0), slp);
    double dT_cs = 0.0;

    double us, ts, qs, t_zu, q_zu, Ub, zz0;
    first_guess(zt, zu, T_s, theta, q_s, q_zt, wnd, charn36(wnd),
                &us, &ts, &qs, &t_zu, &q_zu, &Ub, &zz0);
    double lz0 = log(zz0);
    double nua = visc_air(t_zu);
    double l10 = log(10.0), lzt = log(zt), lzu = log(zu);
    double zdt = t_zu - T_s; zdt = fsign(dmax(fabs(zdt), 1e-9), zdt);
    double zdq = q_zu - q_s; zdq = fsign(dmax(fabs(zdq), 1e-12), zdq);
    double ool = 0.0, zz0t = 1e-4, lz0t = log(zz0t);

    for (int jit = 1; jit <= niter; jit++) {
        double us2 = us * us;
        ool = one_on_l(t_zu, q_zu, us, ts, qs);
        double gust2 = 1.2 * 1.2 * us2
            * pow(dmax(-600.0 * ool / vkarmn, 0.0), 2.0 / 3.0);
        Ub = dmax(sqrt(wnd * wnd + gust2), 0.2);
        double zeta_u = fsign(dmin(fabs(zu * ool), 50.0), zu * ool);
        double zeta_t = fsign(dmin(fabs(zt * ool), 50.0), zt * ool);
        double un10 = us / vkarmn * (l10 - lz0);
        zz0 = charn36(un10) * us2 / grav + 0.11 * nua / us;
        zz0 = dmin(dmax(fabs(zz0), 1e-9), 1.0);
        lz0 = log(zz0);
        double t1 = pow(nua / (zz0 * us), 0.72);
        zz0t = dmin(1.6e-4, 5.8e-5 * t1);
        zz0t = dmin(dmax(fabs(zz0t), 1e-9), 1.0);
        lz0t = log(zz0t);
        double ph = psi_h_coare(zeta_u);
        double fac = vkarmn / (lzu - lz0t - ph);
        ts = zdt * fac; qs = zdq * fac;
        us = dmax(Ub * vkarmn / (lzu - lz0 - psi_m_coare(zeta_u)), 1e-9);
        double prf = lzt - lzu + ph - psi_h_coare(zeta_t);
        t_zu = theta - ts / vkarmn * prf;
        q_zu = q_zt - qs / vkarmn * prf;

        double Qns, Tau, Qlat;
        update_qnsol_tau(zu, T_s, q_s, t_zu, q_zu, us, ts, qs, wnd, Ub,
                         slp, rlw, &Qns, &Tau, &Qlat);
        dT_cs = cs_coare(Qsw, Qns, us, sst, Qlat);
        T_s = sst + dT_cs + st->dT_wl;
        q_s = rdct_qsat_salt * q_sat(dmax(T_s, 200.0), slp);

        update_qnsol_tau(zu, T_s, q_s, t_zu, q_zu, us, ts, qs, wnd, Ub,
                         slp, rlw, &Qns, &Tau, NULL);
        wl_coare(Qsw, Qns, Tau, sst, lon, isecday, niter % jit, st);
        T_s = sst + st->dT_wl + dT_cs;
        q_s = rdct_qsat_salt * q_sat(dmax(T_s, 200.0), slp);

        zdt = t_zu - T_s; zdt = fsign(dmax(fabs(zdt), 1e-9), zdt);
        zdq = q_zu - q_s; zdq = fsign(dmax(fabs(zdq), 1e-12), zdq);
    }

    double r = us / Ub;
    double Cd = dmax(r * r, Cx_min);
    double Ch = dmax(r * ts / zdt, Cx_min);
    double Ce = dmax(r * qs / zdq, Cx_min);
    double Tau, QH, QL, Evap, rhoa;
    bulk_formula(zu, T_s, q_s, t_zu, q_zu, Cd, Ch, Ce, wnd, Ub, slp,
                 &Tau, &QH, &QL, &Evap, &rhoa);
    return QL + QH + Tau;   /* checksum so nothing is dead code */
}

/* xorshift PRNG for input generation */
static uint64_t rng_s = 0x9E3779B97F4A7C15ull;
static double frand(void) {
    rng_s ^= rng_s << 13; rng_s ^= rng_s >> 7; rng_s ^= rng_s << 17;
    return (double)(rng_s >> 11) / 9007199254740992.0;
}

int main(int argc, char **argv) {
    int n = argc > 1 ? atoi(argv[1]) : 200000;   /* grid points */
    int nsteps = argc > 2 ? atoi(argv[2]) : 5;   /* time records */
    int niter = 5;

    if (argc > 1 && argv[1][0] == 'c') {
        /* correctness check mode: one fixed point, full diagnostics,
         * asserted against the scalar oracle by tests/test_tools.py */
        wl_state s0 = {0.0, Hwl_max, 0.0, 0.0};
        double wnd = 5.0;
        double ssq = rdct_qsat_salt * q_sat(295.15, 101000.0);
        double theta = theta_from_z_p0_t_q(2.0, 101000.0, 293.15, 0.012);
        double chk = flux_step_point(2.0, 10.0, 295.15, 293.15, 0.012,
                                     5.0, 0.0, 101000.0, 200.0, 350.0,
                                     12.5, 43200, 5, &s0);
        printf("{\"checksum\": %.15e, \"dT_wl\": %.15e, "
               "\"Qnt_ac\": %.15e, \"ssq\": %.15e, \"theta\": %.15e, "
               "\"wnd\": %.1f}\n", chk, s0.dT_wl, s0.Qnt_ac, ssq, theta,
               wnd);
        return 0;
    }

    double *sst = malloc(n * sizeof(double));
    double *t = malloc(n * sizeof(double));
    double *q = malloc(n * sizeof(double));
    double *u = malloc(n * sizeof(double));
    double *v = malloc(n * sizeof(double));
    double *slp = malloc(n * sizeof(double));
    double *rsw = malloc(n * sizeof(double));
    double *rlw = malloc(n * sizeof(double));
    double *lon = malloc(n * sizeof(double));
    wl_state *st = malloc(n * sizeof(wl_state));

    for (int i = 0; i < n; i++) {
        sst[i] = 285.0 + 15.0 * frand();
        t[i] = sst[i] + 4.0 * (frand() - 0.5);
        q[i] = 0.004 + 0.012 * frand();
        u[i] = 12.0 * (frand() - 0.5);
        v[i] = 12.0 * (frand() - 0.5);
        slp[i] = 98000.0 + 4000.0 * frand();
        rsw[i] = 500.0 * frand();
        rlw[i] = 250.0 + 150.0 * frand();
        lon[i] = 360.0 * frand();
        st[i].dT_wl = 0.0; st[i].Hz_wl = Hwl_max;
        st[i].Qnt_ac = 0.0; st[i].Tau_ac = 0.0;
    }

    /* warm-up pass (page faults, branch predictors) */
    volatile double sink = 0.0;
    for (int i = 0; i < n / 10; i++)
        sink += flux_step_point(2.0, 10.0, sst[i], t[i], q[i], u[i], v[i],
                                slp[i], rsw[i], rlw[i], lon[i], 43200,
                                niter, &st[i]);

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    for (int step = 0; step < nsteps; step++) {
        int isec = 43200 + step * 3600;
        for (int i = 0; i < n; i++)
            sink += flux_step_point(2.0, 10.0, sst[i], t[i], q[i], u[i],
                                    v[i], slp[i], rsw[i], rlw[i], lon[i],
                                    isec, niter, &st[i]);
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);

    double secs = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
    double pts_per_s = (double)n * nsteps / secs;
    printf("{\"metric\": \"cpu_baseline_coare3p6_skin\", \"value\": %.1f, "
           "\"unit\": \"points/s\", \"points\": %d, \"steps\": %d, "
           "\"niter\": %d, \"secs\": %.3f, \"checksum\": %.6e}\n",
           pts_per_s, n, nsteps, niter, secs, sink);
    return 0;
}
