"""Tests for the flat-buffer C-binding entry point (capi.model_buffers)
and, when a toolchain is present, the compiled C++ example."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from aerobulk_tpu import capi


def _bufs(n, fill=0.0):
    return bytearray(np.full(n, fill).tobytes())


def test_model_buffers_matches_flux_step():
    import jax.numpy as jnp
    from aerobulk_tpu.api import AeroBulkConfig, flux_step

    n = 2
    sst = np.array([295.15, 295.15])
    t_zt = np.array([293.15, 298.15])
    q = np.array([0.012, 0.012])
    U = np.array([5.0, 5.0])
    V = np.array([0.0, 0.0])
    slp = np.array([101000.0, 101000.0])

    QL, QH, Tx, Ty, E = (_bufs(n) for _ in range(5))
    capi.model_buffers(1, 1, "ncar", 2.0, 10.0,
                       sst.tobytes(), t_zt.tobytes(), q.tobytes(),
                       U.tobytes(), V.tobytes(), slp.tobytes(),
                       QL, QH, Tx, Ty, E, niter=10)

    cfg = AeroBulkConfig(algo="ncar", zt=2.0, zu=10.0, niter=10)
    out, _ = flux_step(cfg, *(jnp.asarray(x) for x in
                              (sst, t_zt, q, U, V, slp)))
    np.testing.assert_allclose(np.frombuffer(QL), np.asarray(out.QL),
                               rtol=1e-12)
    np.testing.assert_allclose(np.frombuffer(Tx), np.asarray(out.Tau_x),
                               rtol=1e-12)


def test_model_buffers_skin_state_carry():
    """jt/Nt state registry: a 2-step warm-layer run differs from two
    independent 1-step runs only through the carried state."""
    n = 1
    sst = np.array([300.15])
    t_zt = np.array([299.15])
    q = np.array([0.016])
    U = np.array([3.0])
    V = np.array([0.0])
    slp = np.array([101000.0])
    rsw = np.array([700.0])
    rlw = np.array([420.0])

    def run(jt, Nt):
        QL, QH, Tx, Ty, E, Ts = (_bufs(n) for _ in range(6))
        capi.model_buffers(jt, Nt, "coare3p6", 2.0, 10.0,
                           sst.tobytes(), t_zt.tobytes(), q.tobytes(),
                           U.tobytes(), V.tobytes(), slp.tobytes(),
                           QL, QH, Tx, Ty, E, niter=10, use_skin=True,
                           rad_sw=rsw.tobytes(), rad_lw=rlw.tobytes(),
                           T_s=Ts)
        return np.frombuffer(Ts)[0]

    ts1 = run(1, 2)     # first record, state initialized & kept
    ts2 = run(2, 2)     # second record, state carried then dropped
    ts_fresh = run(1, 1)
    assert ts1 == ts_fresh           # same initial state
    assert ts2 != ts1                # warm layer accumulated


def test_model_buffers_detects_dew_point():
    """AEROBULK_INIT semantics at jt==1 (mod_aerobulk.f90:126-153): a C++
    caller handing over dew-point humidity [K] — legal for the reference —
    must get type_of_humidity detection, not a silent 'sh' assumption."""
    import jax.numpy as jnp
    from aerobulk_tpu.api import AeroBulkConfig, flux_step

    n = 2
    sst = np.array([295.15, 295.15])
    t_zt = np.array([293.15, 298.15])
    dp = np.array([288.15, 289.15])        # dew point [K]
    U = np.array([5.0, 5.0])
    V = np.array([0.0, 0.0])
    slp = np.array([101000.0, 101000.0])

    QL, QH, Tx, Ty, E = (_bufs(n) for _ in range(5))
    capi.model_buffers(1, 1, "ncar", 2.0, 10.0,
                       sst.tobytes(), t_zt.tobytes(), dp.tobytes(),
                       U.tobytes(), V.tobytes(), slp.tobytes(),
                       QL, QH, Tx, Ty, E, niter=10)

    cfg = AeroBulkConfig(algo="ncar", zt=2.0, zu=10.0, niter=10,
                         humidity="dp")
    out, _ = flux_step(cfg, *(jnp.asarray(x) for x in
                              (sst, t_zt, dp, U, V, slp)))
    np.testing.assert_allclose(np.frombuffer(QL), np.asarray(out.QL),
                               rtol=1e-12)
    np.testing.assert_allclose(np.frombuffer(QH), np.asarray(out.QH),
                               rtol=1e-12)


def test_model_buffers_rejects_bad_units():
    """The jt==1 validation path aborts on unit-inconsistent inputs, like
    the reference's check_unit_consistency (mod_phymbl.f90:1851-1954)."""
    n = 2
    sst_degC = np.array([22.0, 22.0])      # Celsius — wrong units
    t_zt = np.array([293.15, 298.15])
    q = np.array([0.012, 0.012])
    U = np.array([5.0, 5.0])
    V = np.array([0.0, 0.0])
    slp = np.array([101000.0, 101000.0])
    QL, QH, Tx, Ty, E = (_bufs(n) for _ in range(5))
    with pytest.raises(ValueError):
        capi.model_buffers(1, 1, "ncar", 2.0, 10.0,
                           sst_degC.tobytes(), t_zt.tobytes(), q.tobytes(),
                           U.tobytes(), V.tobytes(), slp.tobytes(),
                           QL, QH, Tx, Ty, E, niter=10)


@pytest.mark.skipif(shutil.which("cmake") is None or
                    shutil.which("ninja") is None,
                    reason="no C++ toolchain")
def test_cpp_example_builds_and_runs():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    build = os.path.join(root, "cpp", "build")
    os.makedirs(build, exist_ok=True)
    subprocess.run(["cmake", "-G", "Ninja", "..",
                    "-DCMAKE_BUILD_TYPE=Release"],
                   cwd=build, check=True, capture_output=True)
    subprocess.run(["ninja"], cwd=build, check=True, capture_output=True)
    env = dict(os.environ,
               PYTHONPATH=root + ":" + os.environ.get("PYTHONPATH", ""))
    res = subprocess.run([os.path.join(build, "example_call_aerobulk")],
                         env=env, capture_output=True, text=True,
                         timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    # COARE3.0 unstable-point golden appears in the output.  NB: these are
    # the *current-reference-semantics* values (visc_air at t_zt,
    # mod_blk_coare3p0.f90:237); doc/ex_ab.dat prints -15.15451/-81.38467
    # because it predates that change (see tests/test_golden_ocean.py).
    assert "-15.15530" in res.stdout
    assert "-81.38902" in res.stdout
    # two interleaved same-shape series disambiguated by series_id must
    # not share warm-layer state (the example verifies interleaved ==
    # sequential and exits nonzero otherwise)
    assert "interleaved series_id OK" in res.stdout
