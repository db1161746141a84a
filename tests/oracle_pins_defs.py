"""Shared definitions for the oracle drift-pin fixture (VERDICT r2 item 8).

The scalar oracles in ``tests/oracle/`` carry the entire reference-parity
burden (docs/PARITY.md): every 1e-12 assertion compares the vectorized
library against them, so a silent edit to the oracle itself would move
BOTH sides of every assertion.  The pin fixture freezes a diverse sample
of oracle *outputs* (inputs + expected values, committed to git in
``tests/fixtures/oracle_pins.npz``); ``tests/test_oracle_pins.py``
re-executes the oracle on the frozen inputs and demands agreement, so any
behavioral drift of the oracle is caught against values pinned in git
history.

Regenerate (only after a DELIBERATE oracle change, with justification in
the commit message):  python tests/make_oracle_pins.py
"""

import math

import numpy as np

from aerobulk_tpu import constants as c

from oracle import ice as oice
from oracle import phymbl as oph
from oracle import turb as otb

N = 8          # points per configuration


def _met_sample(rng, n=N, cold=False):
    """Scalar met inputs spanning stable/unstable, calm/windy regimes."""
    base, spread = (235.0, 40.0) if cold else (276.0, 26.0)
    sst = base + spread * rng.random(n)
    return dict(
        sst=sst,
        t_zt=sst + rng.normal(0.0, 3.0, n),
        q_zt=0.0002 + 0.014 * rng.random(n),
        U_zu=0.2 + 14.0 * rng.random(n),
        slp=97000.0 + 6000.0 * rng.random(n),
        rsw=850.0 * rng.random(n),
        rlw=220.0 + 180.0 * rng.random(n),
        lon=360.0 * rng.random(n),
        isd=np.floor(86400.0 * rng.random(n)),
        frice=rng.random(n),
        # a non-trivial carried warm-layer state
        st_dtwl=0.4 * rng.random(n),
        st_hwl=0.5 + 19.0 * rng.random(n),
        st_qac=2.0e6 * rng.random(n) - 2.0e5,
        st_tac=300.0 * rng.random(n),
    )


def _ocean_eval(algo, r, use_cs, use_wl):
    """One scalar ocean solve through the oracle chain (theta/ssq
    conversion -> turb -> bulk formula), mirroring flux_step."""
    ssq = c.rdct_qsat_salt * oph.q_sat(r["sst"], r["slp"])
    theta = oph.theta_from_z_p0_t_q(2.0, r["slp"], r["t_zt"], r["q_zt"])
    kw = {}
    if use_cs or use_wl:
        kw.update(use_cs=use_cs, use_wl=use_wl,
                  Qsw=(1.0 - c.roce_alb0) * r["rsw"], rad_lw=r["rlw"],
                  slp=r["slp"])
    if use_wl and algo != "ecmwf":
        kw.update(isecday_utc=int(r["isd"]), lon=r["lon"],
                  wl_state=(r["st_dtwl"], r["st_hwl"], r["st_qac"],
                            r["st_tac"]))
    if algo == "ecmwf":
        # ECMWF's warm layer has no solar clock; its state is (dT_wl, Hz)
        if use_wl:
            kw.update(wl_state=(r["st_dtwl"], 3.0))
        out, wl = otb.turb_ecmwf_sc(2.0, 10.0, r["sst"], theta, ssq,
                                    r["q_zt"], r["U_zu"], niter=5, **kw)
        wl = wl + (0.0, 0.0)
    elif algo == "ncar":
        out = otb.turb_ncar_sc(2.0, 10.0, r["sst"], theta, ssq,
                               r["q_zt"], r["U_zu"], niter=5)
        wl = (0.0, 0.0, 0.0, 0.0)
    elif algo == "andreas":
        out = otb.turb_andreas_sc(2.0, 10.0, r["sst"], theta, ssq,
                                  r["q_zt"], r["U_zu"], niter=5)
        wl = (0.0, 0.0, 0.0, 0.0)
    else:
        out, wl = otb.turb_coare_sc(algo, 2.0, 10.0, r["sst"], theta, ssq,
                                    r["q_zt"], r["U_zu"], niter=5, **kw)
    Tau, QH, QL, Evap, rho = oph.bulk_formula(
        10.0, out["T_s"], out["q_s"], out["t_zu"], out["q_zu"],
        out["Cd"], out["Ch"], out["Ce"], r["U_zu"], out["Ubzu"], r["slp"])
    res = dict(Cd=out["Cd"], Ch=out["Ch"], Ce=out["Ce"], T_s=out["T_s"],
               q_s=out["q_s"], t_zu=out["t_zu"], Ubzu=out["Ubzu"],
               QL=QL, QH=QH, Tau=Tau, Evap=Evap)
    if isinstance(wl, tuple) and use_wl:
        res.update(wl_dtwl=wl[0], wl_hwl=wl[1], wl_qac=wl[2], wl_tac=wl[3])
    return res


def _ice_eval(name, r):
    qs_i = oph.q_sat(min(r["sst"], 271.3), r["slp"], l_ice=True)
    theta = oph.theta_from_z_p0_t_q(2.0, r["slp"], r["t_zt"], r["q_zt"])
    Ts_i = min(r["sst"], 271.3)
    a = (2.0, 10.0, Ts_i, theta, qs_i, r["q_zt"], r["U_zu"])
    if name == "ice_nemo":
        out = oice.turb_ice_nemo_sc(*a)
    elif name == "ice_easy":
        out = oice.turb_ice_easy_sc(*a, niter=5)
    elif name == "ice_an05":
        out = oice.turb_ice_an05_sc(*a, niter=5)
    elif name == "ice_lu12":
        out = oice.turb_ice_lu12_sc(*a, r["frice"])
    elif name == "ice_lg15":
        out = oice.turb_ice_lg15_sc(*a, r["frice"], niter=5)
    else:
        out = oice.turb_ice_best_sc(*a, niter=5)
    return {k: float(v) for k, v in out.items()
            if isinstance(v, (int, float))}


_PSI_FNS = {
    "psi_m_coare": otb.psi_m_coare_sc, "psi_h_coare": otb.psi_h_coare_sc,
    "psi_m_ecmwf": otb.psi_m_ecmwf_sc, "psi_h_ecmwf": otb.psi_h_ecmwf_sc,
    "psi_m_ncar": otb.psi_m_ncar_sc, "psi_h_ncar": otb.psi_h_ncar_sc,
    "psi_m_andreas": otb.psi_m_andreas_sc,
    "psi_h_andreas": otb.psi_h_andreas_sc,
    "psi_m_grachev07": otb.psi_m_grachev07_sc,
    "psi_h_grachev07": otb.psi_h_grachev07_sc,
    "psi_m_ice": oice.psi_m_ice_sc, "psi_h_ice": oice.psi_h_ice_sc,
}

_PSI_ZETAS = np.array([-18.3, -4.7, -1.0, -0.21, -1e-3, 0.0, 1e-3,
                       0.47, 2.2, 9.6])


def _psi_eval(name, r):
    return {"psi": _PSI_FNS[name](r["zeta"])}


# configuration registry: name -> (sampler kwargs, evaluate(row) -> dict)
CONFIGS = {
    "coare3p6_noskin": (dict(), lambda r: _ocean_eval("coare3p6", r,
                                                      False, False)),
    "coare3p6_cswl": (dict(), lambda r: _ocean_eval("coare3p6", r,
                                                    True, True)),
    "coare3p0_cswl": (dict(), lambda r: _ocean_eval("coare3p0", r,
                                                    True, True)),
    "ecmwf_cswl": (dict(), lambda r: _ocean_eval("ecmwf", r, True, True)),
    "ncar": (dict(), lambda r: _ocean_eval("ncar", r, False, False)),
    "andreas": (dict(), lambda r: _ocean_eval("andreas", r, False, False)),
    "ice_nemo": (dict(cold=True), lambda r: _ice_eval("ice_nemo", r)),
    "ice_easy": (dict(cold=True), lambda r: _ice_eval("ice_easy", r)),
    "ice_an05": (dict(cold=True), lambda r: _ice_eval("ice_an05", r)),
    "ice_lu12": (dict(cold=True), lambda r: _ice_eval("ice_lu12", r)),
    "ice_lg15": (dict(cold=True), lambda r: _ice_eval("ice_lg15", r)),
    "ice_best": (dict(cold=True), lambda r: _ice_eval("ice_best", r)),
}


def sample_inputs(seed=20260819):
    """Deterministic input table for every configuration (row dicts)."""
    import zlib
    tables = {}
    for name, (skw, _) in CONFIGS.items():
        # zlib.crc32: stable across processes (unlike str hash())
        rng = np.random.default_rng(zlib.crc32(name.encode()) ^ seed)
        tables[name] = _met_sample(rng, **skw)
    for pname in _PSI_FNS:
        tables[pname] = {"zeta": _PSI_ZETAS.copy()}
    return tables


def evaluate_row(name, row):
    """Evaluate one configuration's oracle on one input row (dict of
    python floats) -> dict of float outputs."""
    if name in _PSI_FNS:
        return _psi_eval(name, row)
    return CONFIGS[name][1](row)


def all_names():
    return list(CONFIGS) + list(_PSI_FNS)
