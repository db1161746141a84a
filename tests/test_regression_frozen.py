"""Frozen fp64 self-regression: current outputs vs the committed fixture.

Guards future refactors (thermo rewrites, fusion work, kernel changes)
against unintended numeric drift.  After an *intentional* change,
regenerate with ``python tests/make_regression_fixture.py`` and commit.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "regression_fp64.npz")


@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="fixture not generated")
def test_frozen_regression():
    from make_regression_fixture import build_cases
    with np.load(FIXTURE) as z:
        frozen = {k: z[k] for k in z.files}
    current = build_cases()
    assert set(current) == set(frozen), (
        set(current) ^ set(frozen))
    for k in sorted(frozen):
        np.testing.assert_allclose(
            current[k], frozen[k], rtol=1e-12, atol=1e-300,
            err_msg=f"numeric drift in {k} — if intentional, regenerate "
                    "tests/fixtures/regression_fp64.npz")
