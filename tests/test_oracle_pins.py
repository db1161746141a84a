"""Oracle drift guard (VERDICT r2 item 8).

The scalar oracles in tests/oracle/ are re-executed on every test run,
so a silent edit to the oracle would move BOTH sides of every 1e-12
parity assertion in the suite.  This test re-executes the oracle on the
frozen input table committed in tests/fixtures/oracle_pins.npz and
demands agreement with the frozen outputs — oracle behavior is thereby
pinned to git history.

If this fails after an INTENTIONAL oracle fix: regenerate with
``python tests/make_oracle_pins.py`` and justify the change in the
commit message (the diff of the .npz is the behavioral diff).
"""

import os

import numpy as np
import pytest

import oracle_pins_defs as defs

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "oracle_pins.npz")


@pytest.mark.parametrize("name", defs.all_names())
def test_oracle_pinned(name):
    with np.load(FIXTURE) as z:
        inkeys = [str(k) for k in z[f"{name}/inkeys"]]
        inputs = z[f"{name}/inputs"]
        outkeys = [str(k) for k in z[f"{name}/outkeys"]]
        expected = z[f"{name}/outputs"]

    got = np.empty_like(expected)
    for i in range(inputs.shape[0]):
        row = {k: float(inputs[i, j]) for j, k in enumerate(inkeys)}
        out = defs.evaluate_row(name, row)
        assert sorted(out) == outkeys, (sorted(out), outkeys)
        got[i] = [float(out[k]) for k in outkeys]

    # pure-python double math on frozen doubles: identical libm ->
    # bitwise; allow a whisker for libm version drift, nothing more
    for j, key in enumerate(outkeys):
        np.testing.assert_allclose(
            got[:, j], expected[:, j], rtol=1e-13, atol=1e-300,
            err_msg=f"{name}:{key} — the oracle's behavior drifted from "
                    "the pinned fixture (tests/make_oracle_pins.py)")
