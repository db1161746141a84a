"""Streaming-pipeline tests: prefetch iterator and pipelined stepping
equivalence with the scan path."""

import numpy as np
import jax.numpy as jnp
import pytest

from aerobulk_tpu.api import AeroBulkConfig, run_series
from aerobulk_tpu.pipeline import prefetch_to_device, run_series_pipelined


def _records(nt, npts):
    rng = np.random.default_rng(9)
    for jt in range(nt):
        yield {
            "sst": np.full(npts, 299.0 + 0.5 * np.sin(jt / 3)),
            "t_zt": np.full(npts, 298.0),
            "hum_zt": np.full(npts, 0.015),
            "U_zu": np.full(npts, 4.0 + jt * 0.2),
            "V_zu": np.zeros(npts),
            "slp": np.full(npts, 101000.0),
            "rad_sw": np.full(npts, max(0.0, 600 * np.sin(jt / 24 * np.pi))),
            "rad_lw": np.full(npts, 400.0),
            "isecday_utc": np.int32(jt * 3600 % 86400),
        }


def test_prefetch_yields_all_records():
    recs = list(prefetch_to_device(_records(5, 3)))
    assert len(recs) == 5
    assert all("sst" in r for r in recs)
    np.testing.assert_allclose(np.asarray(recs[-1]["U_zu"]),
                               4.0 + 4 * 0.2)


def test_pipelined_matches_scan():
    nt, npts = 6, 4
    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)

    results, final_state = run_series_pipelined(cfg, _records(nt, npts))
    assert len(results) == nt

    # same thing through the scan path
    recs = list(_records(nt, npts))
    forcing = {k: jnp.asarray(np.stack([r[k] for r in recs]))
               for k in ("sst", "t_zt", "hum_zt", "U_zu", "V_zu", "slp",
                         "rad_sw", "rad_lw")}
    isd = jnp.asarray([r["isecday_utc"] for r in recs], jnp.int32)
    outs, scan_state = run_series(cfg, forcing, isecday_utc=isd)

    np.testing.assert_allclose(
        np.stack([r["QL"] for r in results]), np.asarray(outs.QL),
        rtol=1e-12)
    np.testing.assert_allclose(np.asarray(final_state.dT_wl),
                               np.asarray(scan_state.dT_wl), rtol=1e-12)


def _scan_reference(cfg, nt, npts):
    recs = list(_records(nt, npts))
    forcing = {k: jnp.asarray(np.stack([r[k] for r in recs]))
               for k in ("sst", "t_zt", "hum_zt", "U_zu", "V_zu", "slp",
                         "rad_sw", "rad_lw")}
    isd = jnp.asarray([r["isecday_utc"] for r in recs], jnp.int32)
    return run_series(cfg, forcing, isecday_utc=isd)


@pytest.mark.slow
def test_chunked_matches_scan_uneven_final_chunk():
    """chunk=4 over nt=6 (a full chunk + a ragged 2-record tail) carries
    the warm-layer state across chunk boundaries exactly like one scan."""
    nt, npts = 6, 4
    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)

    results, final_state = run_series_pipelined(
        cfg, _records(nt, npts), chunk=4)
    assert len(results) == 2
    assert results[0]["QL"].shape == (4, npts)
    assert results[1]["QL"].shape == (2, npts)

    outs, scan_state = _scan_reference(cfg, nt, npts)
    QL = np.concatenate([r["QL"] for r in results])
    np.testing.assert_allclose(QL, np.asarray(outs.QL), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(final_state.dT_wl),
                               np.asarray(scan_state.dT_wl), rtol=1e-12)


@pytest.mark.slow
def test_chunked_fused_matches_unchunked_fused():
    """Chunked streaming with the fused backend (interpret mode on CPU)
    equals the resident fused scan bitwise — state crosses chunks."""
    nt, ny, nx = 5, 4, 8
    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)

    def recs2d(nt):
        for r in _records(nt, ny * nx):
            yield {k: (v.reshape(ny, nx) if np.ndim(v) else v)
                   for k, v in r.items()}

    results, final_state = run_series_pipelined(
        cfg, recs2d(nt), chunk=2, backend="fused", fused_block=(8, 128),
        fused_interpret=True)

    recs = list(recs2d(nt))
    forcing = {k: jnp.asarray(np.stack([r[k] for r in recs]))
               for k in ("sst", "t_zt", "hum_zt", "U_zu", "V_zu", "slp",
                         "rad_sw", "rad_lw")}
    isd = jnp.asarray([r["isecday_utc"] for r in recs], jnp.int32)
    outs, scan_state = run_series(cfg, forcing, isecday_utc=isd,
                                  backend="fused", fused_block=(8, 128),
                                  fused_interpret=True)
    QL = np.concatenate([r["QL"] for r in results])
    np.testing.assert_allclose(QL, np.asarray(outs.QL), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(final_state.dT_wl),
                               np.asarray(scan_state.dT_wl), rtol=0, atol=0)


@pytest.mark.slow
def test_per_record_fused_backend():
    """backend='fused' in per-record mode matches the fused scan."""
    nt, ny, nx = 3, 4, 8
    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)

    def recs2d(nt):
        for r in _records(nt, ny * nx):
            yield {k: (v.reshape(ny, nx) if np.ndim(v) else v)
                   for k, v in r.items()}

    results, _ = run_series_pipelined(
        cfg, recs2d(nt), backend="fused", fused_block=(8, 128),
        fused_interpret=True)
    recs = list(recs2d(nt))
    forcing = {k: jnp.asarray(np.stack([r[k] for r in recs]))
               for k in ("sst", "t_zt", "hum_zt", "U_zu", "V_zu", "slp",
                         "rad_sw", "rad_lw")}
    isd = jnp.asarray([r["isecday_utc"] for r in recs], jnp.int32)
    outs, _ = run_series(cfg, forcing, isecday_utc=isd, backend="fused",
                         fused_block=(8, 128), fused_interpret=True)
    np.testing.assert_allclose(
        np.stack([r["QL"] for r in results]), np.asarray(outs.QL),
        rtol=0, atol=0)


@pytest.mark.slow
def test_chunked_i16_wire_close_to_exact():
    """wire='i16' (scale-offset packed feed, half the H2D bytes) must
    reproduce the exact-fp64 stream within quantization tolerance."""
    nt, npts = 6, 16
    # spread the fields so quantization has something to do
    def recs():
        rng = np.random.default_rng(3)
        for jt in range(nt):
            yield {
                "sst": 290.0 + 10.0 * rng.random(npts),
                "t_zt": 289.0 + 10.0 * rng.random(npts),
                "hum_zt": 0.005 + 0.010 * rng.random(npts),
                "U_zu": rng.normal(3.0, 2.0, npts),
                "V_zu": rng.normal(0.0, 2.0, npts),
                "slp": 99000.0 + 3000.0 * rng.random(npts),
                "rad_sw": 400.0 * rng.random(npts),
                "rad_lw": 350.0 + 60.0 * rng.random(npts),
                "isecday_utc": np.int32(jt * 3600),
            }

    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)
    exact, st_exact = run_series_pipelined(cfg, recs(), chunk=3)
    packed, st_packed = run_series_pipelined(cfg, recs(), chunk=3,
                                             wire="i16")
    for a, b in zip(packed, exact):
        np.testing.assert_allclose(a["QL"], b["QL"], rtol=5e-3, atol=0.5)
        np.testing.assert_allclose(a["Tau"], b["Tau"], rtol=5e-3,
                                   atol=1e-3)
    np.testing.assert_allclose(np.asarray(st_packed.dT_wl),
                               np.asarray(st_exact.dT_wl), atol=5e-3)


@pytest.mark.slow
def test_chunked_i8d_wire_close_to_exact():
    """wire='i8d' (int16 base + int8 delta records, (k+1)/k bytes/value)
    must reproduce the exact stream within the delta-quantization bound
    on a smooth-in-time forcing (the format's premise)."""
    nt, npts = 8, 16

    def recs():
        rng = np.random.default_rng(11)
        base = {
            "sst": (290.0 + 10.0 * rng.random(npts)),
            "t_zt": (289.0 + 10.0 * rng.random(npts)),
            "hum_zt": (0.005 + 0.010 * rng.random(npts)),
            "U_zu": rng.normal(3.0, 2.0, npts),
            "V_zu": rng.normal(0.0, 2.0, npts),
            "slp": (99000.0 + 3000.0 * rng.random(npts)),
            "rad_lw": (350.0 + 60.0 * rng.random(npts)),
        }
        rsw0 = 400.0 * rng.random(npts)
        for jt in range(nt):
            r = {k: v + 0.02 * jt * np.abs(v).mean()    # smooth drift
                 for k, v in base.items()}
            # diurnal shortwave: the large-but-smooth delta case
            r["rad_sw"] = rsw0 * max(0.0, np.sin(2 * np.pi * jt / 24.0))
            r["isecday_utc"] = np.int32(jt * 3600)
            yield r

    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)
    exact, st_exact = run_series_pipelined(cfg, recs(), chunk=4)
    packed, st_packed = run_series_pipelined(cfg, recs(), chunk=4,
                                             wire="i8d")
    for a, b in zip(packed, exact):
        np.testing.assert_allclose(a["QL"], b["QL"], rtol=1e-2, atol=1.0)
        np.testing.assert_allclose(a["Tau"], b["Tau"], rtol=1e-2,
                                   atol=2e-3)
    np.testing.assert_allclose(np.asarray(st_packed.dT_wl),
                               np.asarray(st_exact.dT_wl), atol=2e-2)


def test_pack_i8_delta_roundtrip_and_nan():
    """Base + chained-delta reconstruction matches the host packer's own
    running reconstruction; NaN land points survive; error per record is
    bounded by its delta span / 253 with NO chaining."""
    from aerobulk_tpu.pipeline import (_I8_FILL, _I16_FILL,
                                       _pack_i8_delta)

    rng = np.random.default_rng(3)
    k, n = 6, 32
    v = np.empty((k, n), np.float32)
    v[0] = 290.0 + 10.0 * rng.random(n)
    for j in range(1, k):
        v[j] = v[j - 1] + rng.normal(0.0, 0.05, n)   # smooth walk
    v[:, 5] = np.nan                                 # static land mask

    q0, dq, meta = _pack_i8_delta(v)
    assert q0.dtype == np.int16 and dq.dtype == np.int8
    assert dq.shape == (k - 1, n) and meta.shape == (2 * k,)
    assert q0[5] == _I16_FILL and (dq[:, 5] == _I8_FILL).all()

    # host-side reconstruction mirror of pipeline._recon_wire
    so = meta.reshape(-1, 2).astype(np.float64)
    R = np.where(q0 == _I16_FILL, np.nan,
                 q0.astype(np.float64) * so[0, 0] + so[0, 1])
    recs = [R]
    for j in range(1, k):
        d = np.where(dq[j - 1] == _I8_FILL, np.nan,
                     dq[j - 1].astype(np.float64) * so[j, 0] + so[j, 1])
        R = R + d
        recs.append(R)
    rec = np.stack(recs)
    ok = np.isfinite(v)
    assert not np.isfinite(rec[:, 5]).any()
    # per-record bound: i16 base error + that record's own delta span/253
    for j in range(k):
        span = (np.nanmax(v[j] - rec[j - 1]) - np.nanmin(v[j] - rec[j - 1])
                if j else 10.0)
        bound = 10.0 / 65534.0 + (span / 253.0 if j else 0.0) + 1e-6
        assert np.nanmax(np.abs(rec[j][ok[j]] - v[j][ok[j]])) < bound, j


def test_pack_i16_nan_fill_and_roundtrip():
    """A NaN land-mask point must survive as NaN without poisoning the
    field's scale; finite points round-trip within the quantization
    bound."""
    from aerobulk_tpu.pipeline import _I16_FILL, _pack_i16

    v = np.array([290.0, np.nan, 300.0, 295.5], np.float32)
    q, so = _pack_i16(v)
    scale, offset = float(so[0]), float(so[1])
    assert q[1] == _I16_FILL
    rec = q.astype(np.float64) * scale + offset
    np.testing.assert_allclose(rec[[0, 2, 3]], v[[0, 2, 3]],
                               atol=(300.0 - 290.0) / 65534.0)
    # all-NaN field: well-defined sentinel output, finite scale
    q2, so2 = _pack_i16(np.full(3, np.nan, np.float32))
    assert (q2 == _I16_FILL).all() and np.isfinite(so2).all()

    # constant field (zero span): exact reconstruction
    qc, soc = _pack_i16(np.full(5, 101325.0, np.float32))
    rec_c = qc.astype(np.float64) * float(soc[0]) + float(soc[1])
    np.testing.assert_allclose(rec_c, 101325.0, rtol=1e-6)

    # huge span: no int16 overflow, no non-finite scale/offset
    qh, soh = _pack_i16(np.array([-1e30, 0.0, 1e30], np.float32))
    assert np.isfinite(soh).all()
    assert qh.min() >= -32767 and qh.max() <= 32767

    # span below the 1e-30 scale floor: collapses to a constant at vmin
    # (documented floor; no geophysical forcing field has such a span)
    qt, sot = _pack_i16(np.array([1e-38, 2e-38, 3e-38], np.float32))
    assert np.isfinite(sot).all()
    rec_t = qt.astype(np.float64) * float(sot[0]) + float(sot[1])
    # fp32 offset cancellation leaves ~1e-33 absolute error — zero for
    # any physical purpose
    assert np.abs(rec_t).max() < 1e-31


@pytest.mark.slow
def test_chunked_honors_per_record_lon():
    """Records carrying a 'lon' field must anchor the warm-layer solar
    clock in chunked mode exactly as in per-record mode (it must not be
    silently stacked into the forcing and dropped)."""
    nt, npts = 4, 3
    lon = np.array([10.0, 150.0, 250.0])

    def recs(with_lon=True):
        # strong sun around local noon so the warm layer actually builds
        # and its solar clock (hence lon) matters
        for jt in range(nt):
            r = {
                "sst": np.full(npts, 300.0),
                "t_zt": np.full(npts, 299.0),
                "hum_zt": np.full(npts, 0.016),
                "U_zu": np.full(npts, 3.0),
                "V_zu": np.zeros(npts),
                "slp": np.full(npts, 101000.0),
                "rad_sw": np.full(npts, 850.0),
                "rad_lw": np.full(npts, 420.0),
                "isecday_utc": np.int32((10 + jt) * 3600),
            }
            if with_lon:
                r["lon"] = lon
            yield r

    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)
    per_rec, st_a = run_series_pipelined(cfg, recs(),
                                         collect=lambda o: {"QL": o.QL})
    chunked, st_b = run_series_pipelined(cfg, recs(), chunk=2,
                                         collect=lambda o: {"QL": o.QL})
    QL_a = np.stack([r["QL"] for r in per_rec])
    QL_b = np.concatenate([r["QL"] for r in chunked])
    np.testing.assert_allclose(QL_b, QL_a, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st_b.dT_wl),
                               np.asarray(st_a.dT_wl), rtol=1e-12)
    # and it actually differs from the lon=0 default (the bug's symptom)
    _, st_z = run_series_pipelined(cfg, recs(with_lon=False), chunk=2)
    assert not np.allclose(np.asarray(st_b.dT_wl),
                           np.asarray(st_z.dT_wl), rtol=1e-12)


@pytest.mark.slow
def test_collect_wire_i16_close_to_exact():
    """collect_wire='i16' (packed D2H read-back) reconstructs the
    collected fluxes within quantization tolerance, NaNs preserved."""
    nt, npts = 4, 8
    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)
    exact, _ = run_series_pipelined(cfg, _records(nt, npts), chunk=2)
    packed, _ = run_series_pipelined(cfg, _records(nt, npts), chunk=2,
                                     collect_wire="i16")
    for a, b in zip(packed, exact):
        assert a["QL"].dtype == np.float32
        span = float(b["QL"].max() - b["QL"].min()) + 1e-6
        np.testing.assert_allclose(a["QL"], b["QL"],
                                   atol=max(span / 6.5e4, 1e-4))
        span_t = float(b["Tau"].max() - b["Tau"].min()) + 1e-9
        np.testing.assert_allclose(a["Tau"], b["Tau"],
                                   atol=max(span_t / 6.5e4, 1e-8))


def test_wire_requires_chunked_mode():
    import pytest
    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)
    with pytest.raises(ValueError, match="chunk"):
        run_series_pipelined(cfg, _records(2, 3), wire="i16")
    with pytest.raises(ValueError, match="wire"):
        run_series_pipelined(cfg, _records(2, 3), chunk=2, wire="bf16")


def test_collect_selection_materialized_deferred():
    """collect may return jax arrays; the pipeline materializes them to
    numpy after `inflight` newer records, in order."""
    nt, npts = 5, 4
    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)
    results, _ = run_series_pipelined(
        cfg, _records(nt, npts), inflight=3,
        collect=lambda out: {"ts": out.T_s})
    assert len(results) == nt
    assert all(isinstance(r["ts"], np.ndarray) for r in results)
    outs, _ = _scan_reference(cfg, nt, npts)
    np.testing.assert_allclose(np.stack([r["ts"] for r in results]),
                               np.asarray(outs.T_s), rtol=1e-12)


@pytest.mark.slow
def test_chunked_sharded_matches_unsharded():
    """Chunked streaming onto an 8-device mesh (jit backend): chunks are
    device_put straight into the sharded layout and the scan partitions
    under jit — results equal the single-device stream."""
    from aerobulk_tpu.sharding import grid_sharding, make_grid_mesh

    nt, ny, nx = 4, 4, 8
    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)

    def recs2d(nt):
        for r in _records(nt, ny * nx):
            yield {k: (v.reshape(ny, nx) if np.ndim(v) else v)
                   for k, v in r.items()}

    ref, st_ref = run_series_pipelined(cfg, recs2d(nt), chunk=2)

    mesh = make_grid_mesh(shape=(2, 4))
    sh = grid_sharding(mesh)
    out, st = run_series_pipelined(cfg, recs2d(nt), chunk=2, sharding=sh)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(a["QL"], b["QL"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st.dT_wl),
                               np.asarray(st_ref.dT_wl), rtol=1e-12)

    # i16 wire composes with the sharded feed (packed int16 chunks land
    # in the sharded layout, meta replicated)
    out16, st16 = run_series_pipelined(cfg, recs2d(nt), chunk=2,
                                       sharding=sh, wire="i16")
    for a, b in zip(out16, ref):
        span = float(b["QL"].max() - b["QL"].min()) + 1e-6
        # i16 wire implies fp32 on-device compute: rtol covers fp32
        # arithmetic vs the fp64 reference, atol the quantization
        np.testing.assert_allclose(a["QL"], b["QL"], rtol=1e-4,
                                   atol=max(span / 6.5e4, 1e-4))


@pytest.mark.slow
def test_chunked_sharded_fused_uneven_grid_matches_unsharded():
    """The MULTI-CHIP STREAMED production shape (VERDICT r4 item 1):
    chunked fused streaming over an 8-device mesh, on a grid that does
    NOT divide the mesh evenly (the 721-class), must match the
    single-device stream — chunks are shard-padded on the prefetch
    thread, scanned device-local inside shard_map, and the state stays
    sharded and device-resident across >= 3 chunk boundaries."""
    from aerobulk_tpu.sharding import grid_sharding, make_grid_mesh

    nt, ny, nx = 6, 5, 9        # 5 and 9 both uneven on a (2, 4) mesh
    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)

    def recs2d(nt):
        for r in _records(nt, ny * nx):
            yield {k: (v.reshape(ny, nx) if np.ndim(v) else v)
                   for k, v in r.items()}

    ref, st_ref = run_series_pipelined(
        cfg, recs2d(nt), chunk=2, backend="fused", fused_block=(8, 128),
        fused_interpret=True)

    mesh = make_grid_mesh(shape=(2, 4))
    sh = grid_sharding(mesh)
    out, st = run_series_pipelined(
        cfg, recs2d(nt), chunk=2, backend="fused", fused_block=(8, 128),
        fused_interpret=True, sharding=sh)
    assert len(out) == 3
    for a, b in zip(out, ref):
        assert a["QL"].shape == b["QL"].shape == (2, ny, nx)
        np.testing.assert_allclose(a["QL"], b["QL"], rtol=1e-12)
        np.testing.assert_allclose(a["Tau"], b["Tau"], rtol=1e-12)
    assert np.asarray(st.dT_wl).shape == (ny, nx)
    np.testing.assert_allclose(np.asarray(st.dT_wl),
                               np.asarray(st_ref.dT_wl), rtol=1e-12)

    # packed wires compose with the sharded fused feed (packed chunks
    # are shard-padded after packing; reconstruction runs on device
    # before the shard_map)
    for wire, rtol in (("i16", 1e-4), ("i8d", 1e-3)):
        outw, stw = run_series_pipelined(
            cfg, recs2d(nt), chunk=2, backend="fused",
            fused_block=(8, 128), fused_interpret=True, sharding=sh,
            wire=wire)
        for a, b in zip(outw, ref):
            span = float(b["QL"].max() - b["QL"].min()) + 1e-6
            np.testing.assert_allclose(a["QL"], b["QL"], rtol=rtol,
                                       atol=max(span / 250.0 * 0.01, 1e-4))
        assert np.asarray(stw.dT_wl).shape == (ny, nx)


@pytest.mark.slow
def test_chunked_sharded_fused_resumes_from_user_state():
    """A caller-supplied initial SkinState (unpadded, host-side) is
    shard-padded internally and the returned state round-trips at the
    logical shape — split-stream == one-stream."""
    from aerobulk_tpu.sharding import grid_sharding, make_grid_mesh

    nt, ny, nx = 4, 5, 9
    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)
    mesh = make_grid_mesh(shape=(2, 4))
    sh = grid_sharding(mesh)

    def recs2d(lo, hi):
        for r in list(_records(nt, ny * nx))[lo:hi]:
            yield {k: (v.reshape(ny, nx) if np.ndim(v) else v)
                   for k, v in r.items()}

    kw = dict(chunk=2, backend="fused", fused_block=(8, 128),
              fused_interpret=True, sharding=sh)
    _, st_full = run_series_pipelined(cfg, recs2d(0, nt), **kw)
    _, st_a = run_series_pipelined(cfg, recs2d(0, 2), **kw)
    st_a_host = st_a.__class__(*(np.asarray(x) for x in st_a))
    _, st_b = run_series_pipelined(cfg, recs2d(2, nt), skin_state=st_a_host,
                                   **kw)
    np.testing.assert_allclose(np.asarray(st_b.dT_wl),
                               np.asarray(st_full.dT_wl), rtol=1e-12)


@pytest.mark.slow
def test_sharded_chunk_step_collective_free_even_grid():
    """The compiled streamed sharded chunk program (shard-padded feed +
    device-local fused scan) must contain zero collectives on an evenly
    divisible grid — same property the resident sharded production scan
    is pinned to (test_pallas_kernel.py).  (On uneven grids the final
    unpad slice may reshard outputs, which head to the host anyway.)"""
    import jax
    import jax.numpy as jnp
    from aerobulk_tpu.api import init_skin_state
    from aerobulk_tpu.pipeline import _make_sharded_chunk_step
    from aerobulk_tpu.sharding import grid_sharding, make_grid_mesh

    cfg = AeroBulkConfig(algo="coare3p6", niter=3, use_skin=True)
    mesh = make_grid_mesh(shape=(2, 4))
    sh = grid_sharding(mesh)
    k, ny, nx = 2, 8, 16
    rng = np.random.default_rng(2)
    fields = {
        "sst": 285.0 + 15.0 * rng.random((k, ny, nx)),
        "t_zt": 284.0 + 16.0 * rng.random((k, ny, nx)),
        "hum_zt": 0.004 + 0.012 * rng.random((k, ny, nx)),
        "U_zu": rng.normal(0.0, 6.0, (k, ny, nx)),
        "V_zu": rng.normal(0.0, 6.0, (k, ny, nx)),
        "slp": 98000.0 + 4000.0 * rng.random((k, ny, nx)),
        "rad_sw": 500.0 * rng.random((k, ny, nx)),
        "rad_lw": 250.0 + 150.0 * rng.random((k, ny, nx)),
    }
    fc = {n: jax.device_put(
        jnp.asarray(v, jnp.float32),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(
            None, "gy", "gx"))) for n, v in fields.items()}
    isd = jnp.asarray([3600, 7200], jnp.int32)
    lon = jax.device_put(jnp.zeros((ny, nx), jnp.float32), sh)
    st = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh),
        init_skin_state(cfg, (ny, nx), jnp.float32))

    step = _make_sharded_chunk_step(cfg, "fused", (8, 128), True, mesh,
                                    ("gy", "gx"), (ny, nx), "f32")
    hlo = step.lower(fc, None, isd, lon, st).compile().as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "all-to-all", "reduce-scatter"):
        assert coll not in hlo, \
            f"unexpected collective {coll!r} in the streamed sharded " \
            "chunk program"
    outs, ns = step(fc, None, isd, lon, st)
    assert np.isfinite(np.asarray(outs.QL)).all()


def test_per_record_fused_sharded_raises():
    """The per-record fused + multi-device hole is guarded (VERDICT r4
    item 1): chunk=1 is the supported spelling."""
    from aerobulk_tpu.sharding import grid_sharding, make_grid_mesh

    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)
    sh = grid_sharding(make_grid_mesh(shape=(2, 4)))
    with pytest.raises(ValueError, match="chunk=1"):
        run_series_pipelined(cfg, _records(2, 4), backend="fused",
                             sharding=sh)


def test_time_varying_lon_raises():
    """A stream whose records carry a genuinely time-varying lon must be
    refused, not silently pinned to the first record's solar clock
    (ADVICE r4)."""
    nt, npts = 4, 3
    cfg = AeroBulkConfig(algo="coare3p6", niter=5, use_skin=True)

    def recs():
        for jt, r in enumerate(_records(nt, npts)):
            r["lon"] = np.full(npts, 10.0 * jt)   # drifting platform
            yield r

    with pytest.raises(ValueError, match="time-varying 'lon'"):
        run_series_pipelined(cfg, recs(), chunk=2)
    with pytest.raises(ValueError, match="time-varying 'lon'"):
        run_series_pipelined(cfg, recs())


def test_producer_exception_propagates():
    cfg = AeroBulkConfig(algo="ncar", niter=5)

    def bad_records():
        yield from _records(1, 4)
        raise RuntimeError("forcing file truncated")

    import pytest
    with pytest.raises(RuntimeError, match="truncated"):
        run_series_pipelined(cfg, bad_records())
