"""Streaming-pipeline tests: prefetch iterator and pipelined stepping
equivalence with the scan path."""

import numpy as np
import jax.numpy as jnp

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
