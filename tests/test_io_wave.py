"""2-D field series IO + wave-Charnock option tests."""

import jax.numpy as jnp
import numpy as np

from aerobulk_tpu import io as abio
from aerobulk_tpu.algos.coare import turb_coare3p6
from aerobulk_tpu.closures import charn_coare3p6_wave


def test_write_series_2d_fields(tmp_path):
    nt, ny, nx = 4, 3, 5
    time = np.arange(nt) * 3600.0
    fields = {"QL": np.random.default_rng(0).random((nt, ny, nx)),
              "stations": np.random.default_rng(1).random((nt, 7)),
              "scalar_series": np.arange(nt, dtype=np.float64)}
    path = str(tmp_path / "grid.nc")
    abio.write_series(path, time, fields)
    back = abio.read_forcing(path, squeeze_3x3=False)
    np.testing.assert_allclose(back["QL"], fields["QL"])
    np.testing.assert_allclose(back["stations"], fields["stations"])
    np.testing.assert_allclose(back["scalar_series"],
                               fields["scalar_series"])


def test_wave_charnock_changes_roughness():
    n = 3
    sst = jnp.full((n,), 295.15)
    theta = jnp.full((n,), 293.2)
    ssq = jnp.full((n,), 0.0165)
    q = jnp.full((n,), 0.012)
    U = jnp.full((n,), 9.0)

    r0, _ = turb_coare3p6(2.0, 10.0, sst, theta, ssq, q, U, niter=10)
    # young steep sea (slow phase speed) -> rougher than wind-only closure
    hs = jnp.full((n,), 3.0)
    cp = jnp.full((n,), 6.0)
    r1, _ = turb_coare3p6(2.0, 10.0, sst, theta, ssq, q, U, niter=10,
                          wave_hs=hs, wave_cp=cp)
    assert float(r1.z0[0]) > float(r0.z0[0])
    assert float(r1.Cd[0]) > float(r0.Cd[0])
    # old swell (fast phase speed) -> smoother
    r2, _ = turb_coare3p6(2.0, 10.0, sst, theta, ssq, q, U, niter=10,
                          wave_hs=jnp.full((n,), 1.0),
                          wave_cp=jnp.full((n,), 18.0))
    assert float(r2.z0[0]) < float(r1.z0[0])
    # the closure itself: charnock grows with u*/cp
    a_young = charn_coare3p6_wave(jnp.float64(0.3), 3.0, 6.0)
    a_old = charn_coare3p6_wave(jnp.float64(0.3), 3.0, 18.0)
    assert float(a_young) > float(a_old)
