"""Checkpoint/resume: an interrupted series resumes exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aerobulk_tpu.api import AeroBulkConfig, init_skin_state, run_series
from aerobulk_tpu.skin import (load_skin_state, load_skin_state_sharded,
                               save_skin_state, save_skin_state_sharded)


@pytest.mark.slow
def test_series_checkpoint_resume(tmp_path):
    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)
    nt, npts = 10, 3
    rng = np.random.default_rng(1)
    forcing = dict(
        sst=jnp.asarray(299.0 + rng.random((nt, npts))),
        t_zt=jnp.asarray(298.0 + rng.random((nt, npts))),
        hum_zt=jnp.full((nt, npts), 0.015),
        U_zu=jnp.asarray(2.0 + 5.0 * rng.random((nt, npts))),
        V_zu=jnp.zeros((nt, npts)),
        slp=jnp.full((nt, npts), 101000.0),
        rad_sw=jnp.asarray(700.0 * rng.random((nt, npts))),
        rad_lw=jnp.full((nt, npts), 420.0))
    isd = jnp.asarray(np.arange(8, 8 + nt) * 3600, jnp.int32)

    # uninterrupted run
    full, state_full = run_series(cfg, forcing, isecday_utc=isd)

    # run half, checkpoint, restore, run the rest
    half = {k: v[:5] for k, v in forcing.items()}
    rest = {k: v[5:] for k, v in forcing.items()}
    _, state_mid = run_series(cfg, half, isecday_utc=isd[:5])
    ckpt = str(tmp_path / "skin_state.npz")
    save_skin_state(ckpt, state_mid)
    restored = load_skin_state(ckpt)
    outs2, state_end = run_series(cfg, rest, skin_state=restored,
                                  isecday_utc=isd[5:])

    np.testing.assert_allclose(np.asarray(outs2.QL),
                               np.asarray(full.QL)[5:], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(state_end.dT_wl),
                               np.asarray(state_full.dT_wl), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(state_end.Qnt_ac),
                               np.asarray(state_full.Qnt_ac), rtol=1e-12)


@pytest.mark.slow
def test_sharded_checkpoint_roundtrip_preserves_sharding(tmp_path):
    """Orbax checkpoint of a mesh-sharded SkinState: bitwise round-trip,
    restored arrays carry the target sharding, and a sharded series
    resumes exactly — the multi-host-safe path (save_skin_state's host
    gather is single-process only)."""
    from aerobulk_tpu.sharding import grid_sharding, make_grid_mesh

    cfg = AeroBulkConfig(algo="coare3p6", niter=3, use_skin=True)
    mesh = make_grid_mesh()
    sh = grid_sharding(mesh, ndim=1)
    npts, nt = 32, 4

    rng = np.random.default_rng(9)
    forcing = dict(
        sst=jnp.asarray(299.0 + rng.random((nt, npts))),
        t_zt=jnp.asarray(298.0 + rng.random((nt, npts))),
        hum_zt=jnp.full((nt, npts), 0.014),
        U_zu=jnp.asarray(3.0 + 4.0 * rng.random((nt, npts))),
        V_zu=jnp.zeros((nt, npts)),
        slp=jnp.full((nt, npts), 101000.0),
        rad_sw=jnp.asarray(600.0 * rng.random((nt, npts))),
        rad_lw=jnp.full((nt, npts), 410.0))
    isd = jnp.asarray(np.arange(9, 9 + nt) * 3600, jnp.int32)

    _, state_mid = run_series(cfg, {k: v[:2] for k, v in forcing.items()},
                              isecday_utc=isd[:2])
    state_sharded = jax.tree.map(lambda a: jax.device_put(a, sh), state_mid)

    path = str(tmp_path / "skin_ckpt")
    save_skin_state_sharded(path, state_sharded)

    like = jax.tree.map(lambda a: jax.device_put(a, sh),
                        init_skin_state(cfg, (npts,)))
    restored = load_skin_state_sharded(path, like)

    from aerobulk_tpu.skin import SkinState
    for name in SkinState._fields:
        a, b = getattr(restored, name), getattr(state_sharded, name)
        assert a.sharding.is_equivalent_to(sh, a.ndim), name
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed sharded state drives the series to the same trajectory
    out_a, _ = run_series(cfg, {k: v[2:] for k, v in forcing.items()},
                          skin_state=state_mid, isecday_utc=isd[2:])
    out_b, _ = run_series(cfg, {k: v[2:] for k, v in forcing.items()},
                          skin_state=restored, isecday_utc=isd[2:])
    np.testing.assert_array_equal(np.asarray(out_a.QL), np.asarray(out_b.QL))

    # periodic checkpointing to a FIXED path overwrites (np.savez
    # semantics) instead of raising 'Destination already exists'
    state2 = jax.tree.map(lambda a: a + 0.25, state_sharded)
    save_skin_state_sharded(path, state2)
    again = load_skin_state_sharded(path, like)
    np.testing.assert_array_equal(np.asarray(again.dT_wl),
                                  np.asarray(state2.dT_wl))

    # a `like` without shardings (numpy) is rejected loudly instead of
    # silently falling back to restore-sharding-from-file
    import pytest
    like_np = jax.tree.map(np.asarray, init_skin_state(cfg, (npts,)))
    with pytest.raises(TypeError, match="sharding"):
        load_skin_state_sharded(path, like_np)
