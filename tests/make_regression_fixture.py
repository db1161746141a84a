"""Generate the frozen fp64 regression fixture (tests/fixtures/).

Run manually after an *intentional* numerics change:
    python tests/make_regression_fixture.py
and commit the refreshed .npz.  test_regression_frozen.py compares current
outputs against it at rtol=1e-12 — any unintended numeric drift in a
refactor (thermo rewrites, fusion changes, ...) fails loudly.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build_cases():
    import jax.numpy as jnp
    from aerobulk_tpu.api import AeroBulkConfig, flux_step, flux_step_ice

    rng = np.random.default_rng(2026)
    n = 64
    sst = 275.0 + 28.0 * rng.random(n)
    t = sst + rng.normal(0, 2.5, n)
    q = 0.002 + 0.014 * rng.random(n)
    u = 0.1 + 18.0 * rng.random(n)
    v = rng.normal(0, 4.0, n)
    slp = 97000.0 + 5000.0 * rng.random(n)
    rsw = np.where(rng.random(n) < 0.4, 0.0, 900.0 * rng.random(n))
    rlw = 250.0 + 180.0 * rng.random(n)
    lon = 360.0 * rng.random(n) - 120.0

    Ts_i = 248.0 + 24.0 * rng.random(n)
    t_i = Ts_i + rng.normal(0, 3.0, n)
    q_i = 0.0002 + 0.002 * rng.random(n)
    fr = rng.random(n)

    J = jnp.asarray
    out = {"in_sst": sst, "in_t": t, "in_q": q, "in_u": u, "in_v": v,
           "in_slp": slp, "in_rsw": rsw, "in_rlw": rlw, "in_lon": lon,
           "in_Tsi": Ts_i, "in_ti": t_i, "in_qi": q_i, "in_fr": fr}

    for algo in ("coare3p0", "coare3p6", "ecmwf", "ncar", "andreas"):
        for skin in ((False, True) if algo in ("coare3p0", "coare3p6",
                                               "ecmwf") else (False,)):
            for zt, zu in ((2.0, 10.0), (10.0, 10.0)):
                cfg = AeroBulkConfig(algo=algo, zt=zt, zu=zu, niter=7,
                                     use_skin=skin)
                kw = dict(rad_sw=J(rsw), rad_lw=J(rlw),
                          isecday_utc=39600, lon=J(lon)) if skin else {}
                o, st = flux_step(cfg, J(sst), J(t), J(q), J(u), J(v),
                                  J(slp), **kw)
                tag = f"{algo}_{'skin' if skin else 'bulk'}_zt{int(zt)}"
                out[f"{tag}_QL"] = np.asarray(o.QL)
                out[f"{tag}_QH"] = np.asarray(o.QH)
                out[f"{tag}_Tau"] = np.asarray(o.Tau)
                out[f"{tag}_Cd"] = np.asarray(o.diag.Cd)
                out[f"{tag}_Ts"] = np.asarray(o.T_s)
                out[f"{tag}_dTwl"] = np.asarray(st.dT_wl)

    for algo in ("ice_nemo", "ice_easy", "ice_an05", "ice_lu12",
                 "ice_lg15", "ice_best"):
        o, d = flux_step_ice(algo, 2.0, 10.0, J(Ts_i), J(t_i), J(q_i),
                             J(u), J(v), J(slp), frice=J(fr), niter=7)
        out[f"{algo}_QL"] = np.asarray(o.QL)
        out[f"{algo}_QH"] = np.asarray(o.QH)
        out[f"{algo}_Cd"] = np.asarray(d.Cd)
        out[f"{algo}_Ch"] = np.asarray(d.Ch)
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(here, "fixtures"), exist_ok=True)
    path = os.path.join(here, "fixtures", "regression_fp64.npz")
    np.savez_compressed(path, **build_cases())
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
