"""Idealized-forcing acceptance-band tests (SURVEY.md §4.3 analogue)."""

import numpy as np

from aerobulk_tpu import validation
import pytest

# depth tests: acceptance-band build+check (~40 s) — deselect with -m 'not slow' (make test-fast)
pytestmark = pytest.mark.slow


def test_idealized_bands_and_acceptance(tmp_path):
    # short series to keep CI fast: one week of hourly records
    forcing = validation.idealized_forcing(nt=24 * 7)
    runs = {a: validation.run_idealized(a, forcing, niter=6)
            for a in validation.OCEAN_ALGOS_ORDER}
    bands = {}
    for v in validation.FLUX_VARS:
        stack = np.stack([runs[a][v] for a in validation.OCEAN_ALGOS_ORDER])
        bands[v] = {"mean": stack.mean(0), "lower": stack.min(0),
                    "upper": stack.max(0)}
        assert np.all(np.isfinite(stack))
        # the algorithms must agree to within a sane envelope: band width
        # below 40 W/m^2 for heat fluxes, 0.1 N/m^2 for stress (typ.)
        width = bands[v]["upper"] - bands[v]["lower"]
        lim = 0.12 if v == "Tau" else 60.0
        assert np.max(width) < lim, f"{v} band too wide: {np.max(width)}"

    # every member algorithm is accepted by the family envelope
    for a in validation.OCEAN_ALGOS_ORDER:
        verdict = validation.check_against_bands(runs[a], bands)
        assert all(verdict.values()), (a, verdict)

    # a perturbed run (fluxes scaled by 1.5) is rejected
    bad = {v: runs["coare3p6"][v] * 1.5 for v in validation.FLUX_VARS}
    verdict = validation.check_against_bands(bad, bands)
    assert not all(verdict.values())


def test_write_validation_file(tmp_path):
    import aerobulk_tpu.validation as val
    # tiny series through the writer path
    forcing = val.idealized_forcing(nt=48)
    runs = {a: val.run_idealized(a, forcing, niter=4)
            for a in val.OCEAN_ALGOS_ORDER}
    path = str(tmp_path / "VALIDATION_IDEALIZED.nc")
    from aerobulk_tpu import io as abio
    time = np.arange(48) * 3600.0
    variables = {}
    for v in val.FLUX_VARS:
        stack = np.stack([runs[a][v] for a in val.OCEAN_ALGOS_ORDER])
        variables[f"{v}_mean"] = stack.mean(0)
        variables[f"{v}_lower"] = stack.min(0)
        variables[f"{v}_upper"] = stack.max(0)
    abio.write_series(path, time, variables)
    back = abio.read_forcing(path)
    np.testing.assert_allclose(back["Qlat_mean"], variables["Qlat_mean"])
